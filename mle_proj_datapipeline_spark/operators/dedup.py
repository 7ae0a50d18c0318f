"""Compatibility facade for the deduplication operator family.

The implementation was split per VERDICT r6 item 6 (dep-closure
staleness blast radius: one kernel edit re-staled every driver row in
the family) into four separable modules:

- operators/hashing.py — H31 primitive, shingles, exact Jaccard,
  ``exact_dedup``, and ALL geometry constants (stable leaf).
- operators/minhash.py — MinHash signatures, LSH banding, batch and
  incremental (delta) near-dup pair kernels.
- operators/simhash_ngram.py — SimHash fingerprints + block LSH, and
  blocked exact n-gram Jaccard pairs.
- operators/cc.py — connected components (label-prop and
  large-star/small-star), with the driver union-find small-graph arm.

Engine code (``pkg/plans``, ``pkg/streaming``) imports the specific
module it needs; this facade exists so external callers and tests keep
one import path for the whole family. Do NOT import it from new engine
modules — that would re-couple the staleness closures the split
decoupled (tests/test_docs.py enforces this).
"""

from __future__ import annotations

from mle_proj_datapipeline_spark.operators.cc import (  # noqa: F401
    connected_components,
    connected_components_star,
)
from mle_proj_datapipeline_spark.operators.hashing import (  # noqa: F401
    LEN_BAND_WIDTH,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
    NUM_HASHES,
    P31,
    SIMHASH_BITS,
    SIMHASH_BLOCK_BITS,
    SIMHASH_BLOCKS,
    exact_dedup,
    h31,
    h31_py,
    jaccard,
    lsh_geometry_for,
    word_shingles,
)
from mle_proj_datapipeline_spark.operators.minhash import (  # noqa: F401
    minhash_lsh_pairs,
    minhash_lsh_pairs_delta,
    minhash_signature,
    minhash_signature_table,
)
from mle_proj_datapipeline_spark.operators.simhash_ngram import (  # noqa: F401
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
