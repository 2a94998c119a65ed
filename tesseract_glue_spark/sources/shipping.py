"""Ship the package to executor Python workers (--py-files analogue).

The north_rule requires spark-submit --py-files packaging on a real
cluster. For driver-embedded use (tests, the round driver, notebooks)
we self-ship: zip the package once per session and ``addPyFile`` it, so
UDF closures that reference package modules unpickle on workers no
matter the driver's cwd. Mirrors the reference's asset-staging
discipline (atomic tmp→rename, ``languages.py:206-207``).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_tesseract_glue_spark_shipped"


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    """Zip the installed package (py files only) for --py-files /
    addPyFile. Deterministic content; atomic replace."""
    import tesseract_glue_spark

    pkg_dir = os.path.dirname(os.path.abspath(tesseract_glue_spark.__file__))
    root = os.path.dirname(pkg_dir)
    # already running FROM a zip (spark-submit --py-files): that zip IS
    # the artifact — walking a zip-internal path yields nothing, and
    # rebuilding would clobber the live archive with an empty one
    zip_root = root
    while zip_root and not zip_root.lower().endswith(".zip"):
        parent = os.path.dirname(zip_root)
        if parent == zip_root:
            zip_root = ""
            break
        zip_root = parent
    if zip_root:
        return zip_root
    dest_dir = dest_dir or tempfile.gettempdir()
    dest = os.path.join(dest_dir, "tesseract_glue_spark_pyfiles.zip")
    fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".zip.tmp")
    os.close(fd)
    try:
        n_files = 0
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_dir):
                for fn in sorted(filenames):
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
                    n_files += 1
        if n_files == 0:
            raise RuntimeError(f"refusing to ship an empty package zip from {pkg_dir}")
        os.replace(tmp, dest)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return dest


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently add the package zip to this session's worker path.

    No-op if the package is already importable via a cluster-wide
    install or an explicit ``spark-submit --py-files``.
    """
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    try:
        sc.addPyFile(build_pyfiles_zip())
    except Exception:
        # a zip of the same name was already registered — the usual
        # cause is an explicit `spark-submit --py-files <zip>`, which
        # means workers already have the package; if not, the job fails
        # loudly at first UDF execution instead
        pass
    setattr(sc, _SHIPPED_ATTR, True)


if __name__ == "__main__":
    # `python -m tesseract_glue_spark.sources.shipping [dest_dir]` →
    # prints the zip path for `spark-submit --py-files <zip>`
    import sys

    print(build_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None))
