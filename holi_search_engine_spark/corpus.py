"""Deterministic synthetic transcripts corpus (FIXTURES.md §1).

Schema per ``BASELINE.json`` ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.  Fully deterministic: per-conversation RNG seeded by the
conversation index, so the generated table is byte-stable regardless of
partitioning or parallelism — required for the scaling-efficiency runs and
resume tests to compare identical inputs.

Generation is distributed (``spark.range`` over conversations →
``mapInPandas``) so the same code synthesizes a 10^12-turn corpus on a real
cluster; tiny tiers also have a driver-side pandas path for unit tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .query.stopwords import STOPWORDS

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
KNUTH = 2654435761  # turn-count mixer (FIXTURES.md §1)

TOOL_NAMES = [
    "web_search", "code_exec", "file_read", "file_write",
    "browser", "calculator", "sql_query", "shell",
]
ROLES = ["user", "assistant", "tool"]

# tokens exercising every tokenizer/Trie rule (FIXTURES.md §1)
SPECIAL_TOKENS = [
    "UPPER", "CamelCase", "a1b2", "x9", "123", "4567", "123456", "987654",
    "don't", "end.", "semi;colon", "(paren)", "dash-join",
    "café", "naïve", "日本語",
    "<script>alert(1)</script>", "<b>bold</b>", "<meta x=1>hidden</meta>",
    "running", "jumped", "happily", "nationalization", "connections",
    "LONGTOKEN" + "x" * 520,
]

_SYLLABLES = [
    c + v for c in "bcdfghjklmnpqrstvwz" for v in ["a", "e", "i", "o", "u", "ar", "en", "il", "or", "un"]
]


def make_vocabulary(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic lowercase-alpha vocabulary; includes the alphabetic
    stopwords so stopword-handling branches see indexed terms."""
    vocab: list[str] = []
    seen: set[str] = set()
    for w in sorted(w for w in STOPWORDS if w.isalpha()):
        if w not in seen:
            vocab.append(w)
            seen.add(w)
    rng = np.random.RandomState(SEED)
    while len(vocab) < size:
        n = rng.randint(2, 5)
        word = "".join(_SYLLABLES[rng.randint(0, len(_SYLLABLES))] for _ in range(n))
        if word not in seen:
            vocab.append(word)
            seen.add(word)
    return vocab[:size]


def zipf_weights(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype="float64")
    w = ranks ** (-s)
    return w / w.sum()


def turns_for_conv(i: int) -> int:
    return 1 + (i * KNUTH) % 12


def generate_conversations_pdf(conv_indices: np.ndarray, vocab: list[str]) -> pd.DataFrame:
    """Generate all turns for the given conversation indices (deterministic
    per index; used both driver-side and inside mapInPandas partitions)."""
    probs = zipf_weights(len(vocab))
    vocab_arr = np.asarray(vocab, dtype=object)
    special_arr = np.asarray(SPECIAL_TOKENS, dtype=object)
    rows_conv: list[str] = []
    rows_turn: list[int] = []
    rows_role: list[str] = []
    rows_text: list[str] = []
    rows_tool: list[str | None] = []
    rows_ts: list[int] = []
    cdf = np.cumsum(probs)
    for i in conv_indices:
        i = int(i)
        rng = np.random.RandomState((SEED * 1_003 + i) % (2**32))
        n_turns = turns_for_conv(i)
        conv_id = f"conv-{i:08d}"
        # one vectorized Zipf draw for the whole conversation (inverse-CDF
        # over uniforms — ~10x faster than per-turn rng.choice(p=...))
        n_toks = rng.randint(5, 121, size=n_turns)
        total = int(n_toks.sum())
        draws = np.searchsorted(cdf, rng.random_sample(total), side="right")
        offsets = np.concatenate(([0], np.cumsum(n_toks)))
        for t in range(n_turns):
            toks = vocab_arr[draws[offsets[t] : offsets[t + 1]]]
            # sprinkle special tokens (~8% of turns get 1-3 of them)
            if rng.rand() < 0.08:
                extra = special_arr[rng.randint(0, len(special_arr), size=rng.randint(1, 4))]
                toks = np.concatenate([toks, extra])
                rng.shuffle(toks)
            role = ROLES[t % 3]
            rows_conv.append(conv_id)
            rows_turn.append(t)
            rows_role.append(role)
            rows_text.append(" ".join(toks.tolist()))
            rows_tool.append(TOOL_NAMES[i % len(TOOL_NAMES)] if role == "tool" else None)
            rows_ts.append(i * 12 + t)
    base = pd.Timestamp("2026-01-01T00:00:00Z")
    return pd.DataFrame(
        {
            "conv_id": pd.Series(rows_conv, dtype=object),
            "turn_idx": pd.Series(rows_turn, dtype="int32"),
            "role": pd.Series(rows_role, dtype=object),
            "text": pd.Series(rows_text, dtype=object),
            "tool": pd.Series(rows_tool, dtype=object),
            "ts": base + pd.to_timedelta(rows_ts, unit="s"),
        }
    )


def generate_transcripts_pdf(n_convs: int, vocab: list[str] | None = None) -> pd.DataFrame:
    if vocab is None:
        vocab = make_vocabulary()
    return generate_conversations_pdf(np.arange(n_convs), vocab)


def generate_transcripts_df(spark, n_convs: int, partitions: int | None = None):
    """Distributed generation: scales to arbitrary corpus size; output is
    identical to the pandas path for the same ``n_convs``."""
    vocab = make_vocabulary()
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                out = generate_conversations_pdf(pdf["id"].to_numpy(), vocab)
                out["ts"] = out["ts"].dt.tz_localize(None)
                yield out

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=schema)
    )


QUERY_FIXTURES: list[tuple[str, str]] = []


def make_query_fixtures(vocab: list[str]) -> list[tuple[str, str]]:
    """~40 queries covering every Ranker branch (FIXTURES.md §3)."""
    head = vocab[len([w for w in STOPWORDS if w.isalpha()]):][:10]  # hot non-stopword terms
    mid = vocab[1000:1010]
    rare = vocab[4990:5000]
    qs: list[tuple[str, str]] = []
    qs.append(("q_single_hot", head[0]))
    qs.append(("q_single_mid", mid[0]))
    qs.append(("q_single_rare", rare[0]))
    qs.append(("q_multi_hot", f"{head[0]} {head[1]} {head[2]}"))
    qs.append(("q_multi_mixed", f"{head[0]} {mid[1]} {rare[1]}"))
    qs.append(("q_repeated", f"{mid[2]} {mid[2]} {head[3]}"))
    qs.append(("q_all_stop", "the of and to"))
    qs.append(("q_stop_mix", f"the {mid[3]} of {head[4]}"))
    qs.append(("q_absent", "zzzzqqqq xyzzynone"))
    qs.append(("q_absent_mix", f"zzzzqqqq {mid[4]}"))
    qs.append(("q_punct_case", f"{mid[5].capitalize()}, {head[5].upper()}!"))
    qs.append(("q_digits", "123 4567"))
    qs.append(("q_mixed_alnum", "a1b2"))
    qs.append(("q_special_upper", "UPPER"))
    qs.append(("q_stemmed_form", "running"))
    qs.append(("q_stem_target", "run"))
    qs.append(("q_plural", "connections"))
    qs.append(("q_long_multi", " ".join(mid[:6])))
    qs.append(("q_ten_terms", " ".join(vocab[2000:2010])))
    for k, w in enumerate(vocab[3000:3015]):
        qs.append((f"q_gen_{k:02d}", f"{w} {vocab[3100 + k]}"))
    qs.append(("q_rare_pair", f"{rare[2]} {rare[3]}"))
    qs.append(("q_hot_rare", f"{head[6]} {rare[4]}"))
    qs.append(("q_apostrophe", "don't the"))
    qs.append(("q_html", "<b>bold</b>"))
    return qs
