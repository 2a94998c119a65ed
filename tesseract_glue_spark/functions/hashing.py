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

SIMHASH_BITS = 32
