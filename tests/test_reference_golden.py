"""Golden differential against the reference's own outputs (SURVEY.md §5).

Runs the Spark wordcount over the 15-file Gutenberg corpus shipped with the
reference and asserts order-insensitive equality with serial_wc.txt — the
exact method the reference used to validate its parallel engine against its
serial oracle (src/omp_count_words.cpp:144-146).
"""

import os
from collections import Counter

import pytest

from parallel_map_reduce_spark.operators.wordcount import wordcount
from parallel_map_reduce_spark.sources.tables import read_text_corpus, read_text_lines

CORPUS_DIR = "/root/reference/files"
GOLDEN = "/root/reference/serial_wc.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference corpus not present"
)


def load_golden():
    counts = {}
    with open(GOLDEN, "rb") as f:
        for line in f.read().splitlines():
            # parse word:count from the RIGHT — words may contain ':'
            word, _, n = line.rpartition(b":")
            counts[word.decode("utf-8", "surrogateescape")] = int(n)
    return counts


def test_full_corpus_differential(spark):
    paths = sorted(
        os.path.join(CORPUS_DIR, f)
        for f in os.listdir(CORPUS_DIR)
        if f.endswith(".txt") and not f.startswith("small")
    )
    assert len(paths) == 15
    df = read_text_corpus(spark, paths)
    got = {r["word"]: r["count"] for r in wordcount(df).collect()}
    assert sum(got.values()) == 2_297_140
    assert len(got) == 109_223
    assert got["and"] == 70_922
    golden = load_golden()
    assert got == golden


def test_line_mode_matches_except_bom(spark):
    """The scale path (line-oriented splits) differs from the golden only
    in the 8 BOM-prefixed first tokens that Hadoop's reader strips."""
    paths = sorted(
        os.path.join(CORPUS_DIR, f)
        for f in os.listdir(CORPUS_DIR)
        if f.endswith(".txt") and not f.startswith("small")
    )
    df = read_text_lines(spark, paths).withColumnRenamed("value", "text")
    got = {r["word"]: r["count"] for r in wordcount(df).collect()}
    assert sum(got.values()) == 2_297_140
    golden = load_golden()
    merged = Counter()
    for w, n in golden.items():
        merged[w.lstrip("﻿") if w.startswith("﻿") else w] += n
    assert got == dict(merged)


def test_combined_sink_line_parity(spark, tmp_path):
    """O10 parity, end to end: corpus → wordcount → combined word:count
    sink; the emitted line multiset equals serial_wc.txt's (both parsed
    right-of-last-colon, order-insensitive — both engines emit unordered
    hash order)."""
    from parallel_map_reduce_spark import sinks

    paths = sorted(
        os.path.join(CORPUS_DIR, f)
        for f in os.listdir(CORPUS_DIR)
        if f.endswith(".txt") and not f.startswith("small")
    )
    wc = wordcount(read_text_corpus(spark, paths))
    out = str(tmp_path / "combined")
    sinks.write_wordcount_text(wc, out, combined=True)
    back = sinks.read_wordcount_text(spark, out)
    got = {(r["word"], r["count"]) for r in back.collect()}
    want = set(load_golden().items())
    assert got == want
    assert len(got) == 109_223
