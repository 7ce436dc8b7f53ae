#!/usr/bin/env python3
"""Unicode/regex differential for the text-operator oracle twins.

The rounding sweep proved that "both engines compute the same formula"
is not the same as "both engines agree" — round() was an ENGINE
divergence, not a math bug. The remaining engine seams in the text
family are the regex dialects (Java util.regex in Spark vs RE2 in
DuckDB) and string length semantics (both count code points, but
grapheme/astral-plane behavior is easy to get wrong in a twin). This
harness generates a small hostile-unicode documents table — emoji
(astral plane), combining marks, NBSP/zero-width spaces, CRLF, tabs,
bidi marks, fullwidth digits, long runs — writes it in the driver's
exact parquet shape, and the caller then runs the REAL gate over it:

    python3 tools/unicode_differential.py /tmp/graft_unicode
    rm -rf /tmp/verify_uni   # stale dirs from a prior corpus FAIL spuriously
    sbt -batch "runMain graft.Verify /tmp/graft_unicode /tmp/verify_uni \
        token_count quality_score quality_gopher lang_id corpus_stats \
        norm_reading_time quality_repetition pii_scrub text_fix \
        search_bm25 search_match_topk search_phrase multi_match es_query \
        search_bool facet_counts facet_stats es_agg perplexity_bucket \
        dsir_select norm_clean_html norm_boilerplate text_passages \
        text_passages_sent \
        norm_add_counts norm_join_text line_dedup main_text_blocks \
        nlp_preprocess passage_clean norm_strip_selectors dedup_exact \
        quality_classifier badwords_filter bpe_pairs ngram_jaccard \
        json_escape"
    GRAFT_HOSTILE_DATA=1 python3 tools/selfcheck.py /tmp/graft_unicode /tmp/verify_uni

Any FAIL is a live Java-vs-RE2 (or length-semantics) divergence in a
shipped twin — including, since round 16, the four LINE-STRUCTURED
twins (line_dedup, main_text_blocks, nlp_preprocess, passage_clean):
their oracles now implement the REAL line semantics (per-line keep
rule, corpus-level line frequency, page/header/footer stripping), so
this corpus's newline-bearing docs adjudicate them too (the dedicated
line-structure corpus is tools/lines_differential.py). First run's findings: norm_reading_time's twin used RE2's
ASCII \\w+ against the Spark side's (?U)\\w+ — real divergence on
accented/fullwidth words, fixed by spelling the Java unicode word class
out as [\\p{L}\\p{M}\\p{N}\\p{Pc}\\x{200C}\\x{200D}]+ in the twin;
everything else agreed token-for-token on emoji, combining marks, NBSP,
zero-width, bidi and fullwidth inputs: token_count,
quality_score/gopher/repetition, lang_id, corpus_stats, pii_scrub,
text_fix, the boundary docs (empty/whitespace/solo/emoji-only — split
and 0/0 conventions; the whitespace-only doc also pins
text_passages_sent's Java '   '.split("\\s+") == length-0 word count —
the positive-width match at the start adds a leading "" but the
trailing-empties sweep removes the all-empty array, so NO passage is
emitted on either side; probed, the length-1 reading is wrong), the
percentile-bearing twins
(facet_stats/es_agg/perplexity_bucket/dsir_select — interpolation
arithmetic matches through the floor rounding), and the whole
BM25 family (search_bm25/match_topk/multi_match/es_query score real
rows via the planted data/merge/query terms).
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HOSTILE_TOKENS = [
    "café",                      # precomposed accent
    "café",                     # combining accent (2 codepoints)
    "\U0001F600",                     # emoji, astral plane
    "\U0001F468‍\U0001F469",     # ZWJ family sequence fragment
    "a b",                       # NBSP inside a token (not \s in either)
    "x​y",                       # zero-width space inside a token
    "１２３",             # fullwidth digits (\d? no — not ASCII)
    "‮bidi‬",               # RTL override + pop
    "naïve",                     # diaeresis
    "#hash",                          # symbol-ratio trigger
    "ellipsis…",                 # the … the gopher regex matches
    "dots...",                        # the ... alternative
    "UPPER", "MiXeD", "under_score",
    "and", "of", "is",                # stopwords for stop-ratio paths
    "the", "data", "merge", "query",  # search terms: BM25 tf/df/avgdl paths;
                                      # 'the' precedes 'data' so the phrase
                                      # query's consecutive "the data" occurs
    "join", "filter",                 # search_bool's must-contain terms
    "email@example.eu",               # pii trigger
    "+3531234567",                    # phone-ish
    "word" * 10,                      # long token
    "½",                              # No-category digit (Java \w excludes,
                                      # class + Python \w include)
    "x²",                             # superscript No glued to a letter
    "①",                              # circled Nd-lookalike (No)
    "Ⓐ",                              # circled letter (So, Other_Alphabetic:
                                      # Java \w includes, class excludes)
    "\u00A0nbspEdge\u00A0",           # Zs chars at token edges: DuckDB
                                      # trim() strips them, Spark trim()
                                      # does not — zsTrim pins the pair
    "İstanbul",                       # U+0130: full lowercase is i+U+0307
                                      # (Java/Python); utf8proc simple is i
    "ΟΔΟΣ",                           # trailing capital sigma: full casing
                                      # lowers to final ς, simple to σ
    "ΣΙΓΜΑΣ",                         # leading + trailing sigma
    "ΑΣΣ",                            # adjacent sigmas: only the last is final
    "ασ",                             # PRE-EXISTING lowercase final sigma:
                                      # lowering must NOT rewrite it to ς
    "σοφία",                          # pre-existing initial lowercase sigma
    "中Σ",                            # sigma after an UNCASED letter: Java's
                                      # Final_Sigma needs a preceding cased
                                      # char, so this lowers to σ, not ς
    "a'Σ",                            # case-ignorable between cased and Σ:
                                      # skipped, so this DOES lower to ς
    # Final_Sigma boundary pins, probed against Spark's own lower() —
    # the ICU/Unicode-spec semantics, NOT java.lang.String.toLowerCase
    # (the JDK's hardcoded cased/ignorable sets disagree on several of
    # these; Spark follows ICU):
    "a’Σ",                       # U+2019 MidNumLet: ignorable → ς
    "a·Σ",                       # U+00B7 MidLetter: ignorable → ς
    "a^Σ",                            # Sk: ignorable in ICU → ς
    "ΑΒ.Σ",                           # '.' MidNumLet: ignorable → ς
    "ʰΣ",                        # Lm is ignorable and checked FIRST:
                                      # skipped, start reached, no cased
                                      # → σ (despite Other_Lowercase)
    "ᵢΣ",                             # subscript Lm: same → σ
    "ªΣ",                             # ordinal indicator (Lo,
                                      # Other_Lowercase): cased → ς
    "ⅠΣ",                             # roman numeral (Nl, cased) → ς
                                      # (post-lower Ⅰ→ⅰ U+2170)
    "ⒶΣ",                             # circled letter (So, cased) → ς
    "ΑΣ^",                            # follow side: ^ skipped, end
                                      # reached → Σ IS final → ς
]


def doc_text(i: int) -> str:
    # deterministic, varied mix; single-space separated tokens, some docs
    # with newline structure for the line/repetition operators. The first
    # few ids are boundary documents — empty, whitespace-only, one token —
    # where split/divide-by-zero conventions are their own engine seam.
    if i == 0:
        return ""
    if i == 1:
        return "   "
    if i == 2:
        return "solo"
    if i == 3:
        return "\U0001F600"  # one emoji, zero \w words
    if i == 4:
        # text EDGED with \t/\n (the shape tag-stripping leaves behind):
        # pins the zsTrim boundary — Spark's cleanHtml and the DuckDB twin
        # both trim Zs ONLY, so the \t/\n edges must SURVIVE on both sides
        # identically (the documented approximation vs Python strip(),
        # which would eat them; see TextFns.zsTrim). No literal tags: the
        # tag-sensitive twins in this sweep keep their tag-free contract.
        return "\tedge case with tab and newline edges\n"
    if i == 5:
        return "\n\t text after tab-newline prefix"
    toks = [HOSTILE_TOKENS[(i * 7 + k) % len(HOSTILE_TOKENS)]
            for k in range(12 + (i % 9))]
    body = " ".join(toks)
    if i % 3 == 0:
        body += "\nShared banner line\n" + body[: 40 + (i % 13)]
    if i % 5 == 0:
        body += "\r\ncrlf line \t tabbed"
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
    print(f"wrote {n} hostile-unicode docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main()
