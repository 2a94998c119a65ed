"""MinHash/SimHash constants shared by the Spark and DuckDB emissions.

The base string hash is md5-prefix → 32-bit int (portable across
engines, see :func:`tesseract_glue_spark.functions.dialect.str_hash64`).
MinHash permutations are the classic universal-hash family
``h_i(x) = (a_i * x + b_i) mod P`` with P prime > 2^32. Coefficients are
pinned (seeded once) so SQL emitted in different processes is identical;
``a_i < 2^30`` keeps ``a*x < 2^62`` — no BIGINT overflow under Spark's
ANSI mode or DuckDB.
"""

from __future__ import annotations

import random

MINHASH_P = 4294967311  # prime > 2^32
MINHASH_K = 16          # signature length
LSH_BANDS = 4           # 4 bands × 4 rows
LSH_ROWS = MINHASH_K // LSH_BANDS

_rng = random.Random(424242)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 30), _rng.randrange(0, MINHASH_P)) for _ in range(MINHASH_K)
]

# SimHash geometry: 60-bit fingerprint (md5 15-hex-char base hash stays
# inside signed BIGINT) banded 4×15. Pigeonhole: Hamming ≤ 3 over 4 bands
# guarantees ≥1 identical band, so banding loses no true pair at the
# HAMMING_MAX=3 threshold. 15-bit band keys give 32768 values/band —
# the candidate self-join fan-out per band bucket is n/32768, vs n/256
# for the 8-bit bands of a 32-bit simhash (which degenerates to ~O(n²)
# at corpus scale).
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
