#!/usr/bin/env python3
"""Hostile LINE-STRUCTURE differential for the line-structured oracle twins.

Until round 16 the four line-structured twins (line_dedup,
main_text_blocks, nlp_preprocess, passage_clean — plus
norm_strip_selectors' keep-rule column) were intent-level restatements
that assumed the driver corpus's newline-free text contract, so no
hostile differential could adjudicate their LINE semantics. The twins
now implement the real algorithms (per-line keep rule, corpus-level
line frequency, page/header/footer stripping), and this harness feeds
them text that exercises exactly the line machinery:

  - embedded \n structure, trailing newlines (split keeps trailing
    empties in BOTH engines), blank-line runs;
  - CRLF lines, lone \r, and the U+0085/U+2028/U+2029 Java line
    terminators — these pin the (?d) UNIX_LINES fix: Java's bare `$`
    and `(?m)` anchors fire around all of them, while Python (the
    reference) and RE2 (the oracle) are \n-only, so "prose.\r" must
    NOT count as sentence-final and "pad \r\n" must KEEP its
    \r-adjacent spaces;
  - keep-rule boundaries: exactly-30-char lines, 29-char lines with
    and without terminal punctuation;
  - space/tab padded lines, all-space lines (>= minLineChars
    boilerplate candidates made of whitespace);
  - a planted line repeated across >= minDocs docs INSIDE the text
    (line_dedup must remove it from the text body, not just from the
    wrapper-planted banner/footer lines);
  - \f page breaks inside the text (passage_clean's header/footer
    detection must see the extra pages and correctly NOT strip when
    first/last lines diverge).

Text deliberately contains no '<', '>', \x01 or \x02 — those engage
the HTML kernels, whose hostile coverage is the tag-soup fuzz at the
kernel level (HtmlExpressionsSpec/WarcFuzzSpec); here the subject is
the line filter, not the parser.

Run the REAL gate over the generated corpus:

    python3 tools/lines_differential.py /tmp/graft_lines
    rm -rf /tmp/verify_lines
    sbt -batch "runMain graft.Verify /tmp/graft_lines /tmp/verify_lines \
        line_dedup main_text_blocks nlp_preprocess passage_clean \
        norm_strip_selectors"
    GRAFT_HOSTILE_DATA=1 python3 tools/selfcheck.py /tmp/graft_lines /tmp/verify_lines

GRAFT_HOSTILE_DATA=1 opts out of selfcheck's driver-testdata contract
guards (this corpus violates the flat-text contract by design — that
guard keeps protecting the DRIVER corpus's adjudication assumptions).
Any FAIL is a live line-semantics divergence in a shipped twin.
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# Lines chosen to straddle the keep rule (trimmed; keep iff len >= 30
# or sentence-final [.!?] at END OF STRING — \n-only semantics).
LINES = [
    "This line is exactly thirty ch",                # 30 chars -> kept
    "only twenty-nine characters a",                 # 29, no punct -> drop
    "a 29-char line ending with a.",                 # 29, punct -> kept
    "short",                                         # drop
    "short.",                                        # punct -> kept
    "short.\r",                                      # CR after punct: Java's
                                                     # bare $ would keep; the
                                                     # (?d) fix drops it like
                                                     # Python/RE2
    "prose with a carriage return inside\rsame line",
    "   padded both sides but long enough to keep anyway   ",
    "\tleading tab and trailing tab\t",
    "      ",                                        # all-space, len 6
    "Repeated corpus-wide boilerplate sentence here.",  # planted hot line
    "ends with unicode terminator." + "\u2028",  # U+2028 after punct:
                                                     # same Java-$ trap
    "ends with NEL terminator." + "\u0085",
    "ends with paragraph sep." + "\u2029",
    "A genuinely long prose sentence that sails past the length gate with room to spare.",
    "no terminal punct but plenty long enough to pass on length alone yes",
    "Ends with a question mark?",
    "Ends with a bang!",
    "not.quite.terminal.punct:x",                    # drop (no terminal)
    "\u00A0NBSP-edged line that is long enough to keep on length.\u00A0",
                                                     # Zs-trim seam: DuckDB
                                                     # trim() strips NBSP,
                                                     # Spark trim() did not
                                                     # (zsTrim closes it)
    "\u3000ideographic-space padded but plenty long to keep\u3000",
]


def doc_text(i: int) -> str:
    # boundary docs first — empty, newline-only, trailing-newline,
    # CRLF-only, form-feed-only
    if i == 0:
        return ""
    if i == 1:
        return "\n\n\n"
    if i == 2:
        return "single flat line long enough to keep without punctuation aid\n"
    if i == 3:
        return "\r\n\r\n"
    if i == 4:
        return "\f\f"
    parts = [LINES[(i * 5 + k) % len(LINES)] for k in range(3 + (i % 6))]
    if i % 2 == 0:
        # the planted hot line appears in every second doc -> crosses
        # line_dedup's minDocs=5 corpus-wide
        parts.insert(1, "Repeated corpus-wide boilerplate sentence here.")
    if i % 7 == 0:
        # blank-line run inside the text (empty-line collapse + keep rule)
        parts.insert(1, "")
        parts.insert(1, "")
        parts.insert(1, "")
    sep = "\r\n" if i % 5 == 0 else "\n"
    body = sep.join(parts)
    if i % 3 == 0:
        # an in-text page break: passage_clean sees 3+ pages whose
        # first/last lines differ -> header/footer must NOT strip
        body += "\finner page first line\ninner page last line"
    if i % 11 == 0:
        body += "\n"  # trailing newline -> trailing empty split cell
    return body


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
    print(f"wrote {n} hostile-line docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
