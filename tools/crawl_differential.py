#!/usr/bin/env python3
"""Hostile-payload differential for the crawl-surface oracle twins.

The warc/sitemap/robots/link/url families' queries() wrappers
synthesize their payloads (WARC records, sitemap XML, robots.txt
bodies, anchor HTML, URLs) — until round 16 purely from doc_id, so the
other hostile differentials never stressed them end-to-end: their fuzz
was Scala-side kernel fuzz only (WarcFuzzSpec's 1200 frames, the
tag-soup fuzz). The wrappers now splice each document's TEXT into the
payload (WARC response body, sitemap <loc>, robots rule path, one
href + anchor body, the canonicalized URL's path), and the twins splice
identically — so a hostile corpus drives real content through BOTH
engines' parsing pipelines and the DuckDB compare adjudicates:

  - WARC: payloads carrying CRLFCRLF runs, fake "WARC/1.0" headers and
    "Content-Length:" lines, non-ASCII — Content-Length octet framing
    (and the cumulated offset accounting in the twins) must hold no
    matter what bytes the payload carries;
  - sitemap: non-ASCII/percent-junk <loc> values, stray '<' and '&',
    literal "</loc>"/"</url>" (structure injection — the entry regex
    must fragment identically in Java and RE2);
  - robots: rule paths (robots_parse) and TESTED url paths
    (robots_fetch — the path+query extraction and the literal prefix
    cascade) carrying CRLF / bare CR / NEL / U+2028/U+2029
    (CPython-splitlines classes — injected raw lines start groups and
    close entries on BOTH line machines), '#' comment starts, extra
    ':'s;
  - links: hrefs with quotes (early attribute close), anchors with
    nested markup and injected "</a><a ...>", newlines inside (?s)
    spans;
  - url_canonical: '?' and '#' inside the path (fragment-then-query
    stripping order), trailing slash runs, dot segments, embedded
    newlines (the \\z / (?s) discipline — Java's bare $ would treat a
    trailing \\n leniently where RE2/Python do not).

Run the REAL gate over the generated corpus:

    python3 tools/crawl_differential.py /tmp/graft_crawl
    rm -rf /tmp/verify_crawl
    sbt -batch "runMain graft.Verify /tmp/graft_crawl /tmp/verify_crawl \
        url_canonical sitemap_parse sitemap_index warc_parse warc_cdx \
        warc_write link_extract robots_parse robots_fetch anchor_text"
    GRAFT_HOSTILE_DATA=1 python3 tools/selfcheck.py /tmp/graft_crawl /tmp/verify_crawl

Any FAIL is a live engine seam (Java vs RE2 regex, byte accounting,
line-splitting class) in a shipped twin.
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FRAGMENTS = [
    "münchen/straße",            # non-ASCII path
    "путь/файл",  # cyrillic
    "中文/路径",           # CJK
    "emoji/\U0001F600/path",               # astral plane
    "%C3%A9%2Fpath",                       # percent-encoded
    "%zz%1",                               # broken percent escape
    "a b\tc",                              # space + tab
    'quote"end',                           # closes the href attribute early
    "<b>bold</b>",                         # markup inside anchor/loc
    "</loc><loc>injected</loc>",           # sitemap structure injection
    "</url><url><loc>ghost</loc></url>",   # whole-entry injection
    '</a><a href="x">y</a>',               # link structure injection
    "amp&lt;&amp;",                        # xml entities stay literal
    "q?x=9&y=8",                           # query chars for url_canonical
    "frag#deep#deeper",                    # fragment chars
    "trail///",                            # trailing slash run
    "dots/../..",                          # dot segments
    "http://evil.eu/abs",                  # absolute-url-looking path text
    "crlf\r\nUser-agent: evil\r\nDisallow: /",  # robots group injection
    "line\ninjected: x",                   # LF injection
    "lone\rcr",                            # bare CR (splitlines class)
    "nel\u0085line",                       # NEL
    "ls\u2028ps\u2029end",                 # U+2028 / U+2029
    "WARC/1.0\r\nWARC-Type: fake",         # WARC header bait inside payload
    "\r\n\r\n",                            # CRLFCRLF run (framing bait)
    "Content-Length: 0",                   # framing bait
    "# comment start",                     # robots comment char
    "colon:value",                         # extra ':' in a robots value
    "Allow: /sneaky",                      # robots directive bait mid-line
    "x" * 300,                             # long run
]

BOUNDARY = ["", " ", "?", "#", "/"]


def doc_text(i: int) -> str:
    if i < len(BOUNDARY):
        return BOUNDARY[i]
    # robots_parse splices text only for doc_ids % 101 == 0 with
    # doc_id % 3 != 0 (ids 101 and 202 in a 400-doc corpus) — pin the
    # line-injection payloads there
    if i == 101:
        return "crlf\r\nUser-agent: evil\r\nDisallow: /\r\n\r\nAllow: /late"
    if i == 202:
        return ("nel\u0085\tDisallow\t: \t/nel\t\u2028Allow: /ls # tail"
                "\r\u00A0Disallow:\u00A0/nbsp\u00A0"
                "\r\u001FDisallow:\u001F/ctl\u001F")
    parts = [FRAGMENTS[(i * 3 + k) % len(FRAGMENTS)] for k in range(1 + i % 3)]
    return "-".join(parts)


def main():
    out_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    rows = {
        "doc_id": list(range(n)),
        "text": [doc_text(i) for i in range(n)],
        "lang": [["en", "de", "fr", "zh"][i % 4] for i in range(n)],
        "source": [f"src{i % 4}" for i in range(n)],
    }
    rows["n_chars"] = [len(t) for t in rows["text"]]
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64())])
    import os
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({k: rows[k] for k in schema.names}, schema=schema),
        f"{out_dir}/documents.parquet")
    print(f"wrote {n} hostile-crawl docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
