"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Generates the input table declared by BASELINE.json `input_hint`:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` — entirely inside executors (mapInPandas over an id
range), seeded per page id with a hash-based PRNG so the corpus is
identical regardless of partitioning or parallelism level.

Each page embeds relation sentences drawn from a closed entity
vocabulary with a Zipf-skewed popularity law (hot entities stress the
linking join exactly like hot hostnames/celebrities do in real
Common Crawl), plus filler prose.  Entities are mentioned through
alias surface forms; the companion alias dictionary table maps
``alias_norm -> canonical_id`` for the linking stage.

The ground-truth text column is constructed FIRST and the html is
rendered around it such that ``extract_text(html) == text`` holds
byte-for-byte (the BASELINE.json per-row invariant).
"""

from __future__ import annotations

import hashlib
import html as _html
from datetime import datetime, timezone
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- PRNG

_U64 = float(2**64)


def _h64(*parts) -> int:
    key = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(
        hashlib.blake2b(key.encode("utf-8"), digest_size=8).digest(), "big"
    )


def _uniform(*parts) -> float:
    return _h64(*parts) / _U64


def _choice(seq, *parts):
    return seq[_h64(*parts) % len(seq)]


# ------------------------------------------------------- vocabulary

_NAME_A = [
    "Zorvex", "Calyra", "Nimbra", "Quorell", "Tessmark", "Veylith",
    "Ardonis", "Bramwell", "Corvandt", "Delphora", "Ereworth", "Fenlock",
    "Gravante", "Holbrink", "Ixalon", "Jorvane", "Krestal", "Lumetra",
    "Morvath", "Nexalor", "Opaline", "Pravenna", "Quillon", "Ravessa",
    "Sylvaren", "Tormund", "Umbrella", "Vextra", "Wrenfield", "Xandrel",
    "Yorvette", "Zephrane",
]
_NAME_B = [
    "Dynamics", "Institute", "Labs", "Holdings", "Systems", "Foundation",
    "Observatory", "Consortium", "University", "Collective", "Industries",
    "Analytics", "Biotech", "Networks", "Capital", "Robotics",
]

ENTITY_TYPES = [
    "concept", "date", "location", "keyword", "organization", "person",
    "event", "work", "nature", "artificial", "science", "technology",
    "mission", "gene",
]

# binary relation verb phrases; pred string is the phrase itself
VERBS_EN = [
    "acquired", "partnered with", "invested in", "merged with",
    "collaborates with", "sued", "spun off from", "licensed technology to",
]
VERBS_ZH = ["收购了", "投资了", "起诉了"]

_FILLER_WORDS = (
    "the market report shows quarterly growth while analysts expect "
    "renewed momentum across regional supply chains and consumer demand "
    "despite uncertain policy signals from regulators worldwide"
).split()

_FILLER_ZH = "市场报告显示季度增长分析师预计区域供应链和消费需求将恢复增长尽管监管政策信号仍不明朗"


from functools import lru_cache


@lru_cache(maxsize=65536)
def canonical_name(ent_id: int) -> str:
    a = _NAME_A[ent_id % len(_NAME_A)]
    b = _NAME_B[(ent_id // len(_NAME_A)) % len(_NAME_B)]
    suffix = ent_id // (len(_NAME_A) * len(_NAME_B))
    name = f"{a} {b}"
    if suffix > 0:
        name = f"{name} {suffix}"  # e.g. "Zorvex Dynamics 2"
    return name


def entity_type(ent_id: int) -> str:
    return ENTITY_TYPES[_h64("etype", ent_id) % len(ENTITY_TYPES)]


@lru_cache(maxsize=65536)
def aliases_of(ent_id: int) -> List[str]:
    """Surface forms a page may use; index 0 is the canonical form."""
    name = canonical_name(ent_id)
    parts = name.split(" ")
    out = [name, f"The {name}", parts[0]]
    if len(parts) >= 2:
        out.append("".join(p[0] for p in parts).upper() + f"-{ent_id % 97}")
    return out


def zipf_entity(n_entities: int, *seed_parts) -> int:
    """Zipf-ish skew: low ids are hot (id 0 drawn ~cube-root-law)."""
    u = _uniform(*seed_parts)
    return int(n_entities * (u**3.0)) % n_entities


# ------------------------------------------------------- page grammar


def _build_filler_pools() -> tuple[list, list]:
    """Precomputed filler sentence pools (module-level, seeded) — one
    hash per sentence at generation time instead of one per word."""
    en, zh = [], []
    for i in range(512):
        k = 6 + _h64("fl", i) % 8
        words = [_choice(_FILLER_WORDS, "fw", j, i) for j in range(k)]
        en.append(" ".join(words).capitalize() + ".")
        kz = 8 + _h64("fzl", i) % 12
        start = _h64("fzs", i) % (len(_FILLER_ZH) - kz)
        zh.append(_FILLER_ZH[start : start + kz] + "。")
    return en, zh


_FILLER_POOL_EN, _FILLER_POOL_ZH = _build_filler_pools()


def _filler_sentence(lang: str, *seed) -> str:
    pool = _FILLER_POOL_ZH if lang == "zh" else _FILLER_POOL_EN
    return pool[_h64("fpick", *seed) % len(pool)]


def _relation_sentence(
    lang: str, n_entities: int, *seed
) -> Tuple[str, int, int, str]:
    src = zipf_entity(n_entities, "src", *seed)
    tgt = zipf_entity(n_entities, "tgt", *seed, "t")
    if tgt == src:
        tgt = (src + 1 + _h64("bump", *seed) % (n_entities - 1)) % n_entities
    src_alias = _choice(aliases_of(src), "sal", *seed)
    tgt_alias = _choice(aliases_of(tgt), "tal", *seed)
    if lang == "zh":
        verb = _choice(VERBS_ZH, "vz", *seed)
        sent = f"{src_alias}{verb}{tgt_alias}。"
    else:
        verb = _choice(VERBS_EN, "ve", *seed)
        sent = f"{src_alias} {verb} {tgt_alias}."
    return sent, src, tgt, verb


def gen_page(page_id: int, n_entities: int) -> Tuple[str, str, str, str]:
    """Return (url, lang, text, html) for one page, fully deterministic."""
    lang = "zh" if _uniform("lang", page_id) < 0.15 else "en"
    host_ent = zipf_entity(n_entities, "host", page_id)
    host = canonical_name(host_ent).lower().replace(" ", "-")
    url = f"https://www.{host}.example.com/article/{page_id}"

    title = f"Report {page_id}: {canonical_name(host_ent)}"
    n_paras = 2 + _h64("np", page_id) % 4
    paras: List[str] = []
    for p in range(n_paras):
        sents: List[str] = []
        n_sents = 3 + _h64("ns", page_id, p) % 5
        for s in range(n_sents):
            if _uniform("isrel", page_id, p, s) < 0.45:
                sent, _, _, _ = _relation_sentence(
                    lang, n_entities, page_id, p, s
                )
            else:
                sent = _filler_sentence(lang, page_id, p, s)
            sents.append(sent)
        joiner = "" if lang == "zh" else " "
        paras.append(joiner.join(sents))

    text = title + "\n\n" + "\n\n".join(paras)

    esc = _html.escape
    body = "".join(f"<p>{esc(p)}</p>" for p in paras)
    html_doc = (
        f"<html><head><title>{esc(title)}</title>"
        f"<script>var trk={page_id};</script>"
        f"<style>p {{margin: 0}}</style></head>"
        f"<body><h1>{esc(title)}</h1>{body}"
        f"<!-- crawl {page_id} --></body></html>"
    )
    return url, lang, text, html_doc


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def n_entities_for(n_pages: int) -> int:
    return max(200, n_pages // 4)


def pages_df(
    spark: SparkSession, n_pages: int, n_entities: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table over a range of ids."""
    n_ent = n_entities or n_entities_for(n_pages)
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                pid = int(pid)
                url, lang, text, html_doc = gen_page(pid, n_ent)
                ts = datetime.fromtimestamp(
                    base_ts + (_h64("ts", pid) % (86400 * 365)),
                    tz=timezone.utc,
                )
                rows.append(
                    (url, ts, html_doc.encode("utf-8"), text, lang)
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    ids = spark.range(0, n_pages, 1)
    return ids.mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_from_doc_ids(
    docs: DataFrame, id_col: str = "doc_id", n_entities: int = 2000
) -> DataFrame:
    """Deterministically synthesize one Common-Crawl-style page per id
    in an existing table (e.g. /root/testdata documents.parquet) — the
    bridge that lets the KG pipeline run over driver-provided testdata
    without external inputs."""
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf[id_col]:
                pid = int(pid)
                url, lang, text, html_doc = gen_page(pid, n_entities)
                ts = datetime.fromtimestamp(
                    base_ts + (_h64("ts", pid) % (86400 * 365)),
                    tz=timezone.utc,
                )
                rows.append((url, ts, html_doc.encode("utf-8"), text, lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    # r7: a widen-to-defaultParallelism repartition was TRIED here
    # (lay the static asset out wide at build time so the extraction
    # path's adaptive repartition never fires in a timed batch) and
    # REVERTED on full-suite measurement: it saved ~0.27 s on the
    # sf1.0 headline but cost ~0.45-0.65 s on every downstream
    # window consumer of the asset (pages_host_cap 0.17 -> 0.75 s at
    # sf0.1, 0.26 -> 0.93 s at the 10x replica — 32 shuffle-map tasks
    # of fixed overhead over a few thousand rows), and slowed the
    # sf0.1 headline too (0.71 -> 0.94 s).  It is also the wrong
    # shape at scale: the input split count is byte-adaptive already,
    # so a real corpus arrives wide and the widening only ever fired
    # in the small-corpus regime where it loses.  Per-id synthesis
    # keeps the VALUES partitioning-invariant either way.
    return docs.select(id_col).mapInPandas(gen, schema=PAGES_SCHEMA)


ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("alias_norm", T.StringType(), False),
        T.StructField("canonical_id", T.LongType(), False),
        T.StructField("canonical_name", T.StringType(), False),
    ]
)


def alias_dictionary_df(spark: SparkSession, n_entities: int) -> DataFrame:
    """Candidate dictionary for entity linking: alias_norm is the
    clean_str+UPPER normalized surface form (matching what the
    extraction parser emits as entity_name).  An alias shared by
    several entities (e.g. the bare first word "ZORVEX") resolves to
    the MINIMUM canonical_id — deterministic one-alias-one-entity
    semantics; ambiguity never merges distinct entities."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphgen_spark.textkit import clean_str

        for pdf in batches:
            rows = []
            for eid in pdf["id"]:
                eid = int(eid)
                canon = canonical_name(eid).upper()
                for alias in aliases_of(eid):
                    rows.append((clean_str(alias.upper()), eid, canon))
            yield pd.DataFrame(
                rows,
                columns=["alias_norm", "canonical_id", "canonical_name"],
            )

    # ≥4000 entities per partition: a small release dictionary must
    # not fan out across every core — each near-empty Python worker
    # costs ~0.4 s of startup (pandas import) for ~20 µs/entity of
    # synth work, so a partition should carry thousands of entities
    # before another worker pays off (r5 measured 5.5 s -> 1.8 s going
    # 32 -> 8 partitions at n=2000; r7 re-measured the per-entity cost
    # and raised the floor accordingly).  A 10M-entity dictionary
    # still fills the cluster via the default-parallelism cap.
    n_parts = min(
        spark.sparkContext.defaultParallelism,
        max(1, n_entities // 4000),
    )
    ids = spark.range(0, n_entities, 1, numPartitions=n_parts)
    raw = ids.mapInPandas(gen, schema=ALIAS_SCHEMA)
    return (
        raw.groupBy("alias_norm")
        .agg(F.min(F.struct("canonical_id", "canonical_name")).alias("_m"))
        .select(
            "alias_norm",
            F.col("_m.canonical_id").alias("canonical_id"),
            F.col("_m.canonical_name").alias("canonical_name"),
        )
    )


# --------------------------------------------- oracle materialization
#
# The synthesized pages and the alias label table are deterministic
# pure-Python functions of (doc_ids, n_entities).  Materializing them
# to parquet WITHOUT Spark lets an independent engine (DuckDB) re-derive
# the KG triples from first principles — regexp over pages.text plus a
# union-find label table — giving the driver a hard hash-checkable
# oracle for the extraction/linking/canonicalization spine.


def materialize_pages_parquet(
    sf_dir: str, out_path: str, n_entities: int = 2000
) -> str:
    """Write (url, lang, text) for every doc_id in
    ``{sf_dir}/documents.parquet`` — plain pyarrow, no Spark.  Identical
    content to ``pages_from_doc_ids`` by construction (same
    ``gen_page``)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    urls, langs, texts = [], [], []
    for pid in tbl.column("doc_id").to_pylist():
        url, lang, text, _ = gen_page(int(pid), n_entities)
        urls.append(url)
        langs.append(lang)
        texts.append(text)
    out = pa.table({"url": urls, "lang": langs, "text": texts})
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)
    return out_path


def materialize_chunks_parquet(
    sf_dir: str, out_path: str, n_entities: int = 2000,
    chunk_size: int = 512, chunk_overlap: int = 64,
) -> str:
    """Write (chunk_id, url, content, language): the chunk table of the
    CHUNKED pipeline configuration, materialized WITHOUT Spark by the
    same pure-Python kernels ``chunk_documents`` / the fused extractor
    drive (detect_main_language -> split_text(length_fn=count_tokens)
    -> md5 chunk id).  Chunk boundaries are procedural, not SQL — but
    the chunker is deterministic, so landing its output as a parquet
    asset lets DuckDB re-derive the chunk-level mention universe and
    hash-check the chunked graph's conservation laws (kg_ece_check)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphgen_spark.splitter import split_text
    from graphgen_spark.textkit import (
        count_tokens,
        detect_main_language,
        md5_hex,
    )

    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    cids, urls, contents, langs = [], [], [], []
    for pid in tbl.column("doc_id").to_pylist():
        url, _lang, text, _ = gen_page(int(pid), n_entities)
        if not text.strip():
            continue
        language = detect_main_language(text)
        for piece in split_text(
            text, language=language, chunk_size=chunk_size,
            chunk_overlap=chunk_overlap, length_fn=count_tokens,
        ):
            cids.append("chunk-" + md5_hex(piece))
            urls.append(url)
            contents.append(piece)
            langs.append(language)
    out = pa.table(
        {
            "chunk_id": cids,
            "url": urls,
            "content": contents,
            "language": langs,
        }
    )
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)
    return out_path


def materialize_alias_labels_parquet(
    out_path: str, n_entities: int = 2000
) -> str:
    """Write (alias_norm, canonical_key): the entity-linking label table
    computed by a driver-side union-find over the alias<->canonical
    bipartite graph — an implementation INDEPENDENT of the Spark
    large-star/small-star CC in ``pipelines.alias_labels`` (same
    semantics: per-alias min-(id,name) owner, component representative =
    lexicographically smallest canonical name)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from graphgen_spark.textkit import clean_str

    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    best: dict[str, tuple[int, str]] = {}
    for eid in range(n_entities):
        canon = canonical_name(eid).upper()
        for alias in aliases_of(eid):
            a = clean_str(alias.upper())
            cur = best.get(a)
            if cur is None or (eid, canon) < cur:
                best[a] = (eid, canon)

    parent: dict[object, object] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, (_eid, canon) in best.items():
        union(("A", a), ("C", canon))

    rep: dict[object, str] = {}
    for _a, (_eid, canon) in best.items():
        r = find(("C", canon))
        if r not in rep or canon < rep[r]:
            rep[r] = canon

    aliases, keys = [], []
    for a in sorted(best):
        aliases.append(a)
        keys.append(rep[find(("A", a))])
    out = pa.table({"alias_norm": aliases, "canonical_key": keys})
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)
    return out_path
