"""Tesseract language-code registry + language-pack asset staging.

The reference ships a ``{code: name}`` dict of Tesseract language codes
including the ``osd``/``equ`` pseudo-languages (``languages.py:12-130``)
and a hash-verified, atomic-rename download helper
(``languages.py:136-211``, ``languages.py:270-293``). The codes are
public Tesseract data; we keep the registry and re-implement staging
driver-side: assets are fetched once on the driver, hash-verified, and
shipped to executors via ``SparkContext.addFile`` — never fetched from
inside tasks.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

__all__ = [
    "LANGUAGE_CODES",
    "validate_language",
    "is_file_valid",
    "stage_asset",
    "download_asset",
    "fetch_language_pack",
    "fetch_language_bundle",
]

_PAIRS: tuple[tuple[str, str], ...] = (
    ("afr", "Afrikaans"), ("amh", "Amharic"), ("ara", "Arabic"), ("asm", "Assamese"),
    ("aze", "Azerbaijani"), ("aze_cyrl", "Azerbaijani - Cyrilic"), ("bel", "Belarusian"),
    ("ben", "Bengali"), ("bod", "Tibetan"), ("bos", "Bosnian"), ("bre", "Breton"),
    ("bul", "Bulgarian"), ("cat", "Catalan; Valencian"), ("ceb", "Cebuano"), ("ces", "Czech"),
    ("chi_sim", "Chinese - Simplified"), ("chi_tra", "Chinese - Traditional"), ("chr", "Cherokee"),
    ("cym", "Welsh"), ("dan", "Danish"), ("deu", "German"), ("dzo", "Dzongkha"),
    ("ell", "Greek, Modern (1453-)"), ("eng", "English"), ("enm", "English, Middle 1100-1500"),
    ("epo", "Esperanto"), ("equ", "Math / equation detection module"), ("est", "Estonian"),
    ("eus", "Basque"), ("fas", "Persian"), ("fin", "Finnish"), ("fra", "French"),
    ("frk", "Frankish"), ("frm", "French Middle (ca.1400-1600)"), ("gle", "Irish"),
    ("glg", "Galician"), ("grc", "Greek, Ancient (to 1453)"), ("guj", "Gujarati"),
    ("hat", "Haitian; Haitian Creole"), ("heb", "Hebrew"), ("hin", "Hindi"), ("hrv", "Croatian"),
    ("hun", "Hungarian"), ("iku", "Inuktitut"), ("ind", "Indonesian"), ("isl", "Icelandic"),
    ("ita", "Italian"), ("ita_old", "Italian - Old"), ("jav", "Javanese"), ("jpn", "Japanese"),
    ("kan", "Kannada"), ("kat", "Georgian"), ("kat_old", "Georgian - Old"), ("kaz", "Kazakh"),
    ("khm", "Central Khmer"), ("kir", "Kirghiz; Kyrgyz"), ("kor", "Korean"),
    ("kor_vert", "Korean vertical"), ("kur", "Kurdish"), ("kur_ara", "Kurdish Arabic"),
    ("lao", "Lao"), ("lat", "Latin"), ("lav", "Latvian"), ("lit", "Lithuanian"),
    ("ltz", "Luxembourgish"), ("mal", "Malayalam"), ("mar", "Marathi"), ("mkd", "Macedonian"),
    ("mlt", "Maltese"), ("mon", "Mongolian"), ("mri", "Maori"), ("msa", "Malay"),
    ("mya", "Burmese"), ("nep", "Nepali"), ("nld", "Dutch; Flemish"), ("nor", "Norwegian"),
    ("oci", "Occitan post 1500"), ("ori", "Oriya"),
    ("osd", "Orientation and script detection module"), ("pan", "Panjabi; Punjabi"),
    ("pol", "Polish"), ("por", "Portuguese"), ("pus", "Pushto; Pashto"), ("que", "Quechua"),
    ("ron", "Romanian; Moldavian; Moldovan"), ("rus", "Russian"), ("san", "Sanskrit"),
    ("sin", "Sinhala; Sinhalese"), ("slk", "Slovak"), ("slv", "Slovenian"), ("snd", "Sindhi"),
    ("spa", "Spanish; Castilian"), ("spa_old", "Spanish; Castilian - Old"), ("sqi", "Albanian"),
    ("srp", "Serbian"), ("srp_latn", "Serbian - Latin"), ("sun", "Sundanese"), ("swa", "Swahili"),
    ("swe", "Swedish"), ("syr", "Syriac"), ("tam", "Tamil"), ("tat", "Tatar"), ("tel", "Telugu"),
    ("tgk", "Tajik"), ("tgl", "Tagalog"), ("tha", "Thai"), ("tir", "Tigrinya"), ("ton", "Tonga"),
    ("tur", "Turkish"), ("uig", "Uighur; Uyghur"), ("ukr", "Ukrainian"), ("urd", "Urdu"),
    ("uzb", "Uzbek"), ("uzb_cyrl", "Uzbek - Cyrilic"), ("vie", "Vietnamese"), ("yid", "Yiddish"),
    ("yor", "Yoruba"),
)

LANGUAGE_CODES: dict[str, str] = dict(_PAIRS)


def validate_language(lang: str) -> str:
    """Fail fast on unknown language codes (driver-side preflight).

    Mirrors the reference's fail-fast Reader validation posture
    (``reader.py:19-32``, ``tests/test_reader.py:7-23``) but at config
    time, before any job is submitted.
    """
    if lang not in LANGUAGE_CODES:
        raise ValueError(f"unknown Tesseract language code: {lang!r}")
    return lang


def is_file_valid(path: str, md5_hash: str) -> bool:
    """Streaming MD5 check of a staged asset (``languages.py:138-156``)."""
    if not os.path.exists(path):
        return False
    digest = hashlib.md5()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 16), b""):
            digest.update(chunk)
    return digest.hexdigest() == md5_hash


def stage_asset(data: bytes, destination: str, md5_hash: str | None = None) -> str:
    """Write an asset with the reference's verify-then-atomic-rename
    discipline (``languages.py:175-210``): skip if already valid, write
    to a tempfile in the target dir, verify hash, ``os.replace`` into
    place. The same protocol backs our checkpoint/manifest writes.
    """
    if md5_hash and is_file_valid(destination, md5_hash):
        return destination
    if md5_hash:
        actual = hashlib.md5(data).hexdigest()
        if actual != md5_hash:
            raise ValueError(f"asset hash mismatch: expected {md5_hash}, got {actual}")
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(destination) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
        os.replace(tmp, destination)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return destination


PROGRESS_INTERVAL_S = 0.5  # reference prints every 0.5 s (languages.py:194-199)


def _default_progress(destination: str, done: int, total: int | None) -> None:
    name = os.path.basename(destination)
    if total:
        print(f"{name}: {done:,} of {total:,} bytes ({100 * done // total}%)", flush=True)
    else:
        print(f"{name}: {done:,} bytes", flush=True)


def download_asset(
    url: str,
    destination: str,
    md5_hash: str | None = None,
    chunk_size: int = 1 << 14,
    opener=None,
    progress=None,
    clock=None,
) -> str:
    """Chunked download with streaming MD5, skip-if-valid cache, atomic
    rename, and 0.5 s-interval progress reporting — the driver-side
    asset-fetch step (traineddata packs before ``addFile`` distribution;
    ``languages.py:158-211`` semantics, progress cadence per
    ``languages.py:194-199``).

    ``opener`` (defaults to ``urllib.request.urlopen``), ``progress``
    (``callable(done_bytes, total_or_None)``; ``False`` silences; the
    default prints) and ``clock`` (monotonic seconds) are injectable
    for hermetic tests; tasks never call this — only the driver.
    """
    if md5_hash and is_file_valid(destination, md5_hash):
        return destination
    if opener is None:
        from urllib import request

        opener = request.urlopen
    if clock is None:
        import time

        clock = time.monotonic
    if progress is None:
        progress = lambda done, total: _default_progress(destination, done, total)
    os.makedirs(os.path.dirname(destination) or ".", exist_ok=True)
    digest = hashlib.md5()
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(destination) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as out, opener(url) as resp:
            headers = getattr(resp, "headers", None)
            total = None
            if headers is not None:
                try:
                    total = int(headers.get("Content-Length"))
                except (TypeError, ValueError):
                    total = None
            done = 0
            last_report = clock()
            for chunk in iter(lambda: resp.read(chunk_size), b""):
                digest.update(chunk)
                out.write(chunk)
                done += len(chunk)
                now = clock()
                if progress and now - last_report >= PROGRESS_INTERVAL_S:
                    progress(done, total)
                    last_report = now
            if progress and done:
                progress(done, total)  # final 100% report
        if md5_hash and digest.hexdigest() != md5_hash:
            raise ValueError(
                f"downloaded asset hash mismatch: expected {md5_hash}, got {digest.hexdigest()}"
            )
        os.replace(tmp, destination)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return destination


def fetch_language_pack(
    lang: str, destination_dir: str, base_url: str, md5_hash: str | None = None, opener=None
) -> str:
    """Fetch one ``{lang}.traineddata`` into ``destination_dir``
    (``download_language_pack`` analogue, ``languages.py:270-293``) —
    validate the code first, then hash-verified atomic download. Ship to
    executors afterwards via ``SparkContext.addFile``."""
    validate_language(lang)
    dest = os.path.join(destination_dir, f"{lang}.traineddata")
    return download_asset(f"{base_url.rstrip('/')}/{lang}.traineddata", dest, md5_hash, opener=opener)


def fetch_language_bundle(
    url: str,
    destination_dir: str,
    md5_hash: str | None = None,
    opener=None,
) -> list[str]:
    """Fetch a versioned tessdata ZIP bundle and extract every member
    into ``destination_dir`` — the multi-language provisioning path
    (``download_language_pack``'s zip download+extract-all, reference
    ``languages.py:270-293``), built on the same hash-verified atomic
    downloader as single-file fetches.

    Each member is staged with the verify-then-atomic-rename discipline
    (``stage_asset``), so a crash mid-extract never leaves a truncated
    ``.traineddata`` that Tesseract would choke on. Member paths are
    flattened to basenames and ``..``/absolute names are rejected (zip
    path traversal). Returns the extracted file paths, sorted.

    Driver-side only: fetch once, then ship to executors via
    ``SparkContext.addFile`` — tasks never download."""
    import zipfile

    os.makedirs(destination_dir, exist_ok=True)
    bundle = os.path.join(destination_dir, "_bundle_" + os.path.basename(url))
    download_asset(url, bundle, md5_hash, opener=opener)
    out: list[str] = []
    with zipfile.ZipFile(bundle) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            name = os.path.basename(info.filename)
            if not name or info.filename.startswith(("/", "..")) or ".." in info.filename:
                raise ValueError(f"unsafe member path in bundle: {info.filename!r}")
            out.append(stage_asset(zf.read(info), os.path.join(destination_dir, name)))
    os.unlink(bundle)
    return sorted(out)
