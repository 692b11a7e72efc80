"""Synthetic CNPJ-shaped fixtures (FIXTURES.md §B) for golden-parity tests.

Generates headerless ';'-separated **latin-1** CSV shards with the value
quirks the reference's golden output exhibits (data/resultado_final.csv):
decimal-comma capital, yyyymmdd text dates, comma-packed secondary CNAEs,
"S/N" street numbers, leading-zero CEPs, right-padded municipality names,
latin-1 accents, heavy blanks, and orphan keys in both directions.

Deterministic: same seed → byte-identical files. Driver-side generation
(the fixtures are small by design; the 100 TB path reads real shards via
ingest.py + load.py).
"""

from __future__ import annotations

import csv
import os
import random

# The 53-literal IN list from QUERY_FINAL (etl.py:226-233); 50 distinct —
# 4321500 / 4330404 / 4330401 appear twice (IN dedups, SURVEY.md §2.3).
QUERY_CNAES = [
    4321500, 4330404, 4330401, 1622601, 1622602, 1622699, 2330301, 2330302, 2330305,
    2599301, 3313901, 3314707, 3329501, 3511500, 4120400, 4213800, 4221902, 4221903,
    4221904, 4221905, 4222701, 4292801, 4299501, 4299599, 4311801, 4311802, 4312600,
    4313400, 4319300, 4321500, 4322301, 4322302, 4322303, 4329105, 4329199, 4330401,
    4330402, 4330403, 4330404, 4330405, 4330499, 4391600, 4399101, 4399102, 4399103,
    4399104, 4399105, 4399199, 7111100, 7112000, 7119701, 7119702, 7410202,
]
QUERY_CNAES_DISTINCT = sorted(set(QUERY_CNAES))  # 50
# Golden output matched only 49 of the 50 — one code has no cnae-dim row
# (inner join drops it). We reproduce that by omitting the largest code.
MISSING_DIM_CNAE = QUERY_CNAES_DISTINCT[-1]

QUERY_MUNICIPIOS = [6313, 7157, 6669]  # etl.py:224
QUERY_SITUACOES = [2, 3, 8]  # etl.py:225
ALL_SITUACOES = [1, 2, 3, 4, 8]
SITUACAO_DESC = {1: "NULA", 2: "ATIVA", 3: "SUSPENSA", 4: "INAPTA", 8: "BAIXADA"}

_ACCENTED = ["CONSTRUÇÕES", "ENGENHARIA", "SÃO", "JOÃO", "ARAÚJO", "GONÇALVES", "ELÉTRICA"]
_PLAIN = ["ALFA", "BETA", "OMEGA", "LTDA", "SERVICOS", "OBRAS", "COMERCIO", "REFORMAS"]
_LOGRADOUROS = ["RUA", "AVENIDA", "ESTRADA", "TRAVESSA", "ALAMEDA"]
_UFS = ["SP", "RJ", "MG", "PR", "BA"]


def _write_csv(path: str, rows: list[list[str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="latin-1", newline="") as f:
        csv.writer(f, delimiter=";", lineterminator="\n").writerows(rows)


class _ShardWriter:
    """Stream rows into 2 shards (row i < half -> shard 0) without ever
    holding a table in memory — byte-identical to the old build-list-
    then-slice form (same encoding/dialect, same split point), but
    O(1) memory so multi-10M-row baseline fixtures can't OOM the box.
    Context manager (ADVICE r7): an exception during row generation
    releases the handles instead of leaking them alongside partial
    shard files."""

    def __init__(self, paths: list[str], half: int):
        self.half = half
        self.i = 0
        self._files = []
        self._writers = []
        try:
            for p in paths:
                os.makedirs(os.path.dirname(p), exist_ok=True)
                f = open(p, "w", encoding="latin-1", newline="")
                self._files.append(f)
                self._writers.append(
                    csv.writer(f, delimiter=";", lineterminator="\n")
                )
        except Exception:
            self.close()
            raise

    def __enter__(self) -> "_ShardWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def write(self, row: list[str]) -> None:
        self._writers[0 if self.i < self.half else 1].writerow(row)
        self.i += 1

    def close(self) -> None:
        for f in self._files:
            f.close()


def generate(base_dir: str, seed: int = 42, n_empresas: int = 1000, n_estab: int = 2500) -> dict[str, list[str]]:
    """Write fixture shards under base_dir; return {table: [paths]}.

    empresas/estabelecimentos use the Receita shard suffixes (.EMPRECSV /
    .ESTABELE, etl.py:102-105) split across 2 shards each so suffix routing
    and multi-file union are exercised; dims are single headerless CSVs.
    """
    rng = random.Random(seed)
    paths: dict[str, list[str]] = {}

    # --- empresas: keys 1..n, ~10% of estabelecimento keys will be orphans
    paths["empresas"] = [
        os.path.join(base_dir, "zips", "empresas", f"K3241.K0320{k}.EMPRECSV")
        for k in range(2)
    ]
    with _ShardWriter(paths["empresas"], n_empresas // 2) as w:
        for i in range(1, n_empresas + 1):
            name_words = [rng.choice(_ACCENTED if rng.random() < 0.3 else _PLAIN) for _ in range(3)]
            capital = f"{rng.randrange(0, 900000)},{rng.randrange(100):02d}" if rng.random() > 0.05 else "0,00"
            w.write(
                [
                    f"{i:08d}",
                    " ".join(name_words),
                    str(rng.choice([2062, 2135, 2240, 3999, 4120, 2011, 2038, 1015, 1023, 1031])),
                    str(rng.choice([5, 10, 16, 49])),
                    capital,
                    rng.choice(["01", "03", "05", ""]),
                    "",
                ]
            )

    # --- estabelecimentos: ~10% orphan cnpj_basico (beyond n_empresas)
    municipios_pool = QUERY_MUNICIPIOS + [7107, 6001, 8100, 9205, 5300]
    paths["estabelecimentos"] = [
        os.path.join(
            base_dir, "zips", "estabelecimentos", f"K3241.K0320{k}.ESTABELE"
        )
        for k in range(2)
    ]
    with _ShardWriter(paths["estabelecimentos"], n_estab // 2) as w:
        for i in range(1, n_estab + 1):
            orphan = rng.random() < 0.10
            basico = rng.randrange(n_empresas + 1, n_empresas + 200) if orphan else rng.randrange(1, n_empresas + 1)
            cnae = rng.choice(QUERY_CNAES_DISTINCT) if rng.random() < 0.5 else rng.choice([111301, 8599604, 5611201, 9602501])
            sec = ",".join(str(rng.choice(QUERY_CNAES_DISTINCT)) for _ in range(rng.randrange(1, 4))) if rng.random() < 0.4 else ""
            ddd1 = f"{rng.choice([11, 41, 21, 31])}" if rng.random() > 0.2 else ""
            w.write(
                [
                    f"{basico:08d}",
                    f"{rng.randrange(1, 3):04d}",
                    f"{rng.randrange(100):02d}",
                    str(rng.choice([1, 2])),
                    (" ".join(rng.choice(_PLAIN) for _ in range(2)) if rng.random() > 0.4 else ""),
                    str(rng.choice(ALL_SITUACOES)),
                    f"{rng.randrange(1995, 2025)}{rng.randrange(1, 13):02d}{rng.randrange(1, 29):02d}",
                    str(rng.choice([0, 1, 63])),
                    "",
                    "",
                    f"{rng.randrange(1990, 2025)}{rng.randrange(1, 13):02d}{rng.randrange(1, 29):02d}",
                    str(cnae),
                    sec,
                    rng.choice(_LOGRADOUROS),
                    f"{rng.choice(_ACCENTED)} {rng.choice(_PLAIN)}",
                    (str(rng.randrange(1, 9999)) if rng.random() > 0.1 else "S/N"),
                    ("SALA " + str(rng.randrange(1, 200)) if rng.random() < 0.2 else ""),
                    rng.choice(["CENTRO", "JARDIM PAULISTA", "VILA NOVA", "COHAB"]),
                    f"{rng.randrange(1000000, 99999999):08d}",
                    rng.choice(_UFS),
                    str(rng.choice(municipios_pool)),
                    ddd1,
                    (f"{rng.randrange(20000000, 99999999)}" if ddd1 else ""),
                    "",
                    "",
                    "",
                    "",
                    (f"contato{i}@exemplo.com.br" if rng.random() > 0.5 else f"FISCAL{i}@EXEMPLO.COM.BR") if rng.random() > 0.3 else "",
                    "",
                    "",
                ]
            )

    # --- dims
    other_cnaes = [111301, 8599604, 5611201, 9602501]
    cnae_rows = [
        [str(c), f"ATIVIDADE DE CONSTRUÇÃO {c}"]
        for c in QUERY_CNAES_DISTINCT + other_cnaes
        if c != MISSING_DIM_CNAE  # golden matched 49/50 (SURVEY.md §2.3)
    ]
    muni_rows = [[str(m), f"MUNICIPIO {m}".ljust(48)] for m in municipios_pool]  # right-padded
    muni_rows[0][1] = "CARAPICUIBA".ljust(48)
    mot_rows = [[str(k), SITUACAO_DESC[k]] for k in ALL_SITUACOES]
    nat_rows = [[str(c), f"NATUREZA {c}"] for c in [2062, 2135, 2240, 3999, 4120, 2011, 2038, 1015, 1023, 1031]]
    qual_rows = [[str(c), f"QUALIFICACAO {c}"] for c in [5, 10, 16, 49]]
    for name, rows in [
        ("cnae", cnae_rows),
        ("municipios", muni_rows),
        ("motivo_situacao_cadastral", mot_rows),
        ("natureza_juridica", nat_rows),
        ("qualificacao_responsavel", qual_rows),
    ]:
        p = os.path.join(base_dir, "dims", f"{name}.csv")
        _write_csv(p, rows)
        paths[name] = [p]

    return paths
