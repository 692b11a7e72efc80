"""Ingestion stage — O1-O3 (HTTP fetch, idempotency, ZIP extract) and O8
(suffix-routed discovery), per ETLCNPJFinalEmpresaEstabelecimentos.py:60-110.

All driver-side, like the reference: acquisition is I/O orchestration, not
a Spark operator. At cluster scale the same manifest fans out to a
pre-staging job (object store multipart copies); Spark then reads the
extracted shards in parallel via load.py. Network use is entirely
caller-initiated; the full GET → chunked stream → atomic rename →
idempotent-skip cycle is exercised over a REAL (loopback) HTTP
connection in tests/test_cnpj_parity.py::
test_http_download_pipeline_live_loopback — no external network needed.
"""

from __future__ import annotations

import os
import shutil
import urllib.request
import zipfile

from etl_cnpjs_spark.cnpj.schemas import SUFFIX_TO_TABLE

_CHUNK = 1024 * 1024  # 1 MiB stream chunks (etl.py:70)
_TIMEOUT = 240  # seconds (etl.py:64)


def read_manifest(path: str) -> list[str]:
    """One URL per line (data/empresas.txt / estabelecimentos.txt)."""
    with open(path, encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def download_file(url: str, dest: str, timeout: int = _TIMEOUT) -> str:
    """Streamed idempotent fetch (O1+O2): skip if dest exists (etl.py:61-63),
    else GET in 1 MiB chunks to a temp path, then atomic rename (O7)."""
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as out:
        shutil.copyfileobj(resp, out, _CHUNK)
    os.replace(tmp, dest)
    return dest


def extract_zip(zip_path: str, extract_to: str) -> list[str]:
    """O3: unzip; corrupt archive → RuntimeError (etl.py:75-81)."""
    os.makedirs(extract_to, exist_ok=True)
    try:
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(extract_to)
            return [os.path.join(extract_to, n) for n in zf.namelist()]
    except zipfile.BadZipFile as exc:
        raise RuntimeError(f"corrupt zip: {zip_path}") from exc


def discover(root: str) -> dict[str, list[str]]:
    """O8: walk root, route shards to tables by Receita suffix
    (.EMPRECSV → empresas, .ESTABELE → estabelecimentos, etl.py:102-105).
    No rename needed — Spark reads any path; routing is metadata here."""
    routed: dict[str, list[str]] = {t: [] for t in SUFFIX_TO_TABLE.values()}
    for dirpath, _dirs, files in os.walk(root):
        for fname in files:
            for suffix, tbl in SUFFIX_TO_TABLE.items():
                if fname.upper().endswith(suffix):
                    routed[tbl].append(os.path.join(dirpath, fname))
    for tbl in routed:
        routed[tbl].sort()
    return routed
