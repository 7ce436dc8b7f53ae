package graft.sources

import graft.SparkSpec

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot rotation keeps exactly N, newest first, and never prunes the newest") {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    (1 to 5).foreach { i =>
      SnapshotStore.write(Seq((i.toLong, s"v$i")).toDF("id", "value"), dir, ts = 1000L + i)
    }
    assert(SnapshotStore.list(spark, dir) === Seq(1005L, 1004L, 1003L, 1002L, 1001L))

    val deleted = SnapshotStore.prune(spark, dir, keep = 3)
    assert(deleted.toSet === Set(1002L, 1001L), "exactly the oldest two are dropped")
    assert(SnapshotStore.list(spark, dir) === Seq(1005L, 1004L, 1003L), "exactly N survive")

    val latest = SnapshotStore.readLatest(spark, dir).collect()
    assert(latest.length === 1 && latest(0).getString(1) === "v5",
      "readLatest serves the newest snapshot")

    // A zero/negative retention config must still keep the newest copy.
    assert(SnapshotStore.prune(spark, dir, keep = 0).toSet === Set(1004L, 1003L))
    assert(SnapshotStore.list(spark, dir) === Seq(1005L))
    assert(SnapshotStore.readLatest(spark, dir).collect()(0).getString(1) === "v5")
  }

  test("a stray non-numeric snapshot_ts dir is ignored, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("snapstray").toString
    SnapshotStore.write(Seq((1L, "v1")).toDF("id", "value"), dir, ts = 1001L)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(dir, "snapshot_ts=00000000000000001001.bak"))
    assert(SnapshotStore.list(spark, dir) === Seq(1001L))
    assert(SnapshotStore.readLatest(spark, dir).count() === 1L)
    assert(SnapshotStore.prune(spark, dir, keep = 1) === Seq.empty)
  }

  test("snapshot listing on an empty/missing dir is empty, prune is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("snapempty").toString + "/nothing"
    assert(SnapshotStore.list(spark, dir) === Seq.empty)
    assert(SnapshotStore.prune(spark, dir, keep = 3) === Seq.empty)
  }
}
