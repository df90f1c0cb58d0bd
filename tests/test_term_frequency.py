"""TermFrequency job tests (``jobs/TermFrequency.java:29-183``): the two
quirks in isolation (¾ truncation of the CLEANED page, original-case stem
input) plus vectorized-vs-transliteration agreement on the fixture corpus
and the Spark stage end-to-end."""

import math

import pandas as pd
import pytest

from holi_search_engine_spark.functions.stemmer import stem_word
from holi_search_engine_spark.functions.tokenizer import term_frequency_batch
from holi_search_engine_spark.oracle.pandas_oracle import term_frequency_doc

DICT = frozenset({"hello", "world", "run", "running", "the", "care"})


def _one(text: str, dictionary=DICT) -> dict[str, tuple[int, float]]:
    out = term_frequency_batch(
        pd.DataFrame({"doc": [1], "text": [text]}), dictionary, ["doc"]
    )
    return {
        r.term: (int(r.tf), float(r.normalized_tf)) for r in out.itertuples()
    }


def test_three_quarter_truncation_of_cleaned_page():
    # 16 cleaned chars -> first 12 kept: "hello world " — the last word
    # falls past the cut entirely (TermFrequency.java:67 truncates the
    # cleaned STRING, not the token list).
    got = _one("hello world hehe")
    assert set(got) == {"hello", "world"}


def test_truncation_is_on_cleaned_not_raw():
    # raw has a tag that cleaning removes; ¾ applies AFTER removal
    raw = "<b>hello</b> ok"
    # cleaned = " hello  ok" (10 chars) -> cut at 7 -> " hello "
    got = _one(raw)
    assert set(got) == {"hello"}


def test_original_case_stem_quirk():
    # The stemmer sees the ORIGINAL case (TermFrequency.java:105-110): the
    # lowercase suffix tables still strip "-es" from "Caresses" (only its
    # first char is uppercase) but the preserved 'C' makes the emitted term
    # "Caress", distinct from the Indexer's stem("caresses") = "caress";
    # an ALL-CAPS word ("RUNNING") passes through entirely unstemmed.
    assert stem_word("caresses") == "caress"
    # 22 cleaned chars -> cut at 16 keeps exactly "Caresses RUNNING"
    got = _one("Caresses RUNNING xxxxx")
    assert "Caress" in got  # pass-2 term, case-carrying stem
    assert "caress" not in got
    assert "caresses" in got  # pass-1 lowercase surface term
    assert "RUNNING" in got  # no suffix matched: unstemmed pass-2 term
    assert "run" not in got


def test_position_union_across_passes_and_single_sqrt_l2():
    # doc: "running hello running x" -> cleaned len 23, cut 17: "running hello run"
    got = _one("running hello running x")
    # pass1 (accepted: running=1, hello=2; "run" in dict=3): running{1}, hello{2}, run{3}
    # pass2 (all): stem("running")="run"{1}, hello{2}, run{3} -> union run{1,3}
    assert got["running"][0] == 1
    assert got["hello"][0] == 1
    assert got["run"][0] == 2
    l2 = math.sqrt(1 + 1 + 4)
    assert got["run"][1] == pytest.approx(2 / l2)


def test_matches_transliteration_on_corpus(xs_pdf, dictionary):
    got = term_frequency_batch(xs_pdf, dictionary, ["conv_id", "turn_idx"])
    rows = []
    for r in xs_pdf.itertuples():
        for term, (tf, ntf) in term_frequency_doc(r.text, dictionary).items():
            rows.append((r.conv_id, int(r.turn_idx), term, tf, ntf))
    oracle = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "term", "tf", "normalized_tf"]
    )
    a = got.sort_values(["conv_id", "turn_idx", "term"]).reset_index(drop=True)
    b = oracle.sort_values(["conv_id", "turn_idx", "term"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["term"].to_numpy() == b["term"].to_numpy()).all()
    assert (a["tf"].to_numpy() == b["tf"].to_numpy()).all()
    assert a["normalized_tf"].to_numpy() == pytest.approx(
        b["normalized_tf"].to_numpy()
    )


def test_spark_stage_matches_kernel(spark, xs_df, xs_pdf, dictionary):
    from holi_search_engine_spark.plans.term_frequency import term_frequency_stage

    out = (
        term_frequency_stage(xs_df, dictionary)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "term"])
        .reset_index(drop=True)
    )
    local = (
        term_frequency_batch(xs_pdf, dictionary, ["conv_id", "turn_idx"])
        .sort_values(["conv_id", "turn_idx", "term"])
        .reset_index(drop=True)
    )
    assert len(out) == len(local) > 0
    assert (out["term"].to_numpy() == local["term"].to_numpy()).all()
    assert (out["tf"].to_numpy() == local["tf"].to_numpy()).all()
    assert out["normalized_tf"].to_numpy() == pytest.approx(
        local["normalized_tf"].to_numpy()
    )
