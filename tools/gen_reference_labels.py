#!/usr/bin/env python3
"""Generate reference-truth cascade labels for the parity fixture.

Runs the ACTUAL reference filter implementations (loaded standalone from
/root/reference, heavy deps stubbed) over the texts of the committed
cc_pages fixture and the shared documents testdata, in the exact order
and with the exact thresholds of
config/text/heuristic_filter_english_pipeline.yaml:50-239, with the
cascade's sequential early-drop semantics (a doc stops at its first
rejecting filter). Output parquet: (url, keep, first_reject, scores)
where scores[i] is NaN for filters the reference never evaluated.

This is oracle GENERATION only — the Scala engine is an independent
implementation; this script exists so `sbt -batch test` can assert
keep/drop F1 vs the reference without running Python at test time.
"""
import glob
import importlib.util
import sys
import types

import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/reference/nemo_curator/stages/text"

for fake in ["huggingface_hub", "requests", "platformdirs", "transformers"]:
    sys.modules.setdefault(fake, types.ModuleType(fake))
sys.modules["transformers"].AutoTokenizer = object
sys.modules["platformdirs"].user_cache_dir = lambda: "/tmp"

def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod

for pkg in ["nemo_curator", "nemo_curator.stages", "nemo_curator.stages.text",
            "nemo_curator.stages.text.utils", "nemo_curator.stages.text.filters"]:
    sys.modules.setdefault(pkg, types.ModuleType(pkg))
load("nemo_curator.stages.text.utils.constants", BASE + "/utils/constants.py")
load("nemo_curator.stages.text.utils.text_utils", BASE + "/utils/text_utils.py")
load("nemo_curator.stages.text.filters.doc_filter", BASE + "/filters/doc_filter.py")
hf = load("nemo_curator.stages.text.filters.heuristic_filter", BASE + "/filters/heuristic_filter.py")

# exact order + thresholds of heuristic_filter_english_pipeline.yaml:50-239
CASCADE = [
    hf.NonAlphaNumericFilter(max_non_alpha_numeric_to_text_ratio=0.25),
    hf.SymbolsToWordsFilter(max_symbol_to_word_ratio=0.1),
    hf.NumbersFilter(max_number_to_text_ratio=0.15),
    hf.UrlsFilter(max_url_to_text_ratio=0.2),
    hf.WhiteSpaceFilter(max_white_space_ratio=0.25),
    hf.ParenthesesFilter(max_parentheses_ratio=0.1),
    hf.BoilerPlateStringFilter(remove_if_at_top_or_bottom=True, max_boilerplate_string_ratio=0.4),
    hf.RepeatedLinesFilter(max_repeated_line_fraction=0.7),
    hf.RepeatedParagraphsFilter(max_repeated_paragraphs_ratio=0.7),
    hf.RepeatedLinesByCharFilter(max_repeated_lines_char_ratio=0.8),
    hf.RepeatedParagraphsByCharFilter(max_repeated_paragraphs_char_ratio=0.8),
    hf.WordCountFilter(min_words=50, max_words=100000),
    hf.PunctuationFilter(max_num_sentences_without_endmark_ratio=0.85),
    hf.WordsWithoutAlphabetsFilter(min_words_with_alphabets=0.8),
    hf.CommonEnglishWordsFilter(min_num_common_words=2, stop_at_false=True),
    hf.MeanWordLengthFilter(min_mean_word_length=3, max_mean_word_length=10),
    hf.LongWordFilter(max_word_length=1000),
    hf.EllipsisFilter(max_num_lines_ending_with_ellipsis_ratio=0.3),
    hf.RepeatingTopNGramsFilter(n=2, max_repeating_ngram_ratio=0.2),
    hf.RepeatingTopNGramsFilter(n=3, max_repeating_ngram_ratio=0.18),
    hf.RepeatingTopNGramsFilter(n=4, max_repeating_ngram_ratio=0.16),
    hf.RepeatingDuplicateNGramsFilter(n=5, max_repeating_duplicate_ngram_ratio=0.15),
    hf.RepeatingDuplicateNGramsFilter(n=6, max_repeating_duplicate_ngram_ratio=0.14),
    hf.RepeatingDuplicateNGramsFilter(n=7, max_repeating_duplicate_ngram_ratio=0.13),
    hf.RepeatingDuplicateNGramsFilter(n=8, max_repeating_duplicate_ngram_ratio=0.12),
    hf.RepeatingDuplicateNGramsFilter(n=9, max_repeating_duplicate_ngram_ratio=0.11),
    hf.RepeatingDuplicateNGramsFilter(n=10, max_repeating_duplicate_ngram_ratio=0.10),
    hf.BulletsFilter(max_bullet_lines_ratio=0.9),
]

# Scala-side names (graft.filters.HeuristicFilters *.name) in cascade order
NAMES = [
    "alpha_numeric", "symbol_to_word", "numbers_ratio", "urls_ratio",
    "white_space", "parentheses_ratio", "boilerplate_string_ratio",
    "repeated_lines", "repeated_paragraphs", "repeated_lines_char",
    "repeated_paragraphs_char", "word_count", "punctuation",
    "words_without_alphabets", "common_english_words", "mean_word_length",
    "max_word_length", "ellipsis",
    "repeating_top_2grams", "repeating_top_3grams", "repeating_top_4grams",
    "repeating_dup_5gram", "repeating_dup_6gram", "repeating_dup_7gram",
    "repeating_dup_8gram", "repeating_dup_9gram", "repeating_dup_10gram",
    "bullet_ratio",
]


def label(text):
    scores = [float("nan")] * len(CASCADE)
    for i, f in enumerate(CASCADE):
        # reference filters assume non-empty docs survive earlier stages;
        # a filter raising on a pathological doc counts as a drop there
        try:
            s = float(f.score_document(text))
        except (ZeroDivisionError, ValueError):
            return False, NAMES[i], scores
        scores[i] = s
        if not f.keep_document(s):
            return False, NAMES[i], scores
    return True, None, scores


def run(texts_with_keys, out, key_name, key_type):
    keys, keeps, rejects, allscores = [], [], [], []
    for key, text in texts_with_keys:
        k, r, s = label(text)
        keys.append(key)
        keeps.append(k)
        rejects.append(r)
        allscores.append(s)
    table = pa.table({
        key_name: pa.array(keys, key_type),
        "keep": pa.array(keeps, pa.bool_()),
        "first_reject": pa.array(rejects, pa.string()),
        "scores": pa.array(allscores, pa.list_(pa.float64())),
    })
    pq.write_table(table, out)
    kept = sum(keeps)
    print(f"{out}: {len(keys)} docs, {kept} kept ({kept / len(keys):.1%})")


# 1. cc_pages fixture
cc = pq.read_table(glob.glob("src/test/resources/cc_pages_tiny/part-*.parquet")[0],
                   columns=["url", "text"])
run(zip(cc.column("url").to_pylist(), cc.column("text").to_pylist()),
    "src/test/resources/labels_ref_cc_tiny.parquet", "url", pa.string())

# 2. shared documents testdata (sf0.01 == 500 docs)
docs = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                     columns=["doc_id", "text"])
run(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()),
    "src/test/resources/labels_ref_documents.parquet", "doc_id", pa.int64())

# 3b helper: a cascade/name list for the NON-English pipeline
# (heuristic_filter_non_english_pipeline.yaml — the English cascade minus
# NonAlphaNumeric / CommonEnglishWords / WordsWithoutAlphabets)
NON_EN_DROP = {"alpha_numeric", "common_english_words", "words_without_alphabets"}
NON_EN = [(f, n) for f, n in zip(CASCADE, NAMES) if n not in NON_EN_DROP]

def label_with(cascade_pairs, text):
    for f, name in cascade_pairs:
        try:
            s = float(f.score_document(text))
        except (ZeroDivisionError, ValueError):
            return False, name
        if not f.keep_document(s):
            return False, name
    return True, None

# 3. content-keyed labels across the shared-testdata scales for BOTH
# shipped cascades, over a CONSTRUCTED input that exercises keeps and
# the filters where the two cascades genuinely diverge (EN-only
# alpha_numeric / common_english rejects vs non-EN white_space /
# mean_word_length): case 0 = stopword-enriched keepable prose,
# case 1 = '%' spam (EN drops at alpha_numeric, non-EN at white_space),
# case 2 = de-the'd 'zz' interleave (EN common_english vs non-EN
# mean_word_length), case 3 = raw text. The construction is replicated
# verbatim in SparkEntry (Spark SQL) and the oracle SQL (DuckDB); the
# oracle joins on md5(constructed) so it holds at any sf scale.
import hashlib

SUFFIX = (' and that is how the story of the day came to a close with all of'
          ' it said and done for sure by the people we know and trust in this town.')

def construct(doc_id, text):
    m = doc_id % 4
    if m == 0: return text + SUFFIX
    if m == 1: return text.replace(' ', ' the ') + '. ' + ('% ' * 60)
    if m == 2: return text.replace('the', 'thx').replace(' ', ' zz ') + '.'
    return text

NON_EN_DROP = {"alpha_numeric", "common_english_words", "words_without_alphabets"}
NON_EN = [(f, n) for f, n in zip(CASCADE, NAMES) if n not in NON_EN_DROP]
EN = list(zip(CASCADE, NAMES))

def label_with(cascade_pairs, text):
    for f, name in cascade_pairs:
        try:
            s = float(f.score_document(text))
        except (ZeroDivisionError, ValueError):
            return False, name
        if not f.keep_document(s):
            return False, name
    return True, None

for cascade, out in [(EN, "src/test/resources/labels_ref_by_md5.parquet"),
                     (NON_EN, "src/test/resources/labels_ref_non_en_by_md5.parquet")]:
    seen = {}
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        docs = pq.read_table(f"/root/testdata/{sf}/documents.parquet", columns=["doc_id", "text"])
        for i, text in zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()):
            c = construct(i, text)
            key = hashlib.md5(c.encode("utf-8")).hexdigest()
            if key not in seen:
                seen[key] = label_with(cascade, c)
    table = pa.table({
        "text_md5": pa.array(list(seen.keys()), pa.string()),
        "keep": pa.array([v[0] for v in seen.values()], pa.bool_()),
        "first_reject": pa.array([v[1] for v in seen.values()], pa.string()),
    })
    pq.write_table(table, out)
    kept = sum(v[0] for v in seen.values())
    print(f"{out}: {len(seen)} distinct constructed texts, {kept} kept")
