"""Batch transform library -- the hook system reimagined.

fetchez hooks are staged operators over entry batches (``FetchHook`` with
``stage in {pre, file, post}`` and ``run(entries) -> entries``,
/root/reference/src/fetchez/hooks/__init__.py:15-62).  Here a transform is
a named, parameterized ``DataFrame -> DataFrame`` function composed inside
``foreachBatch``; stages map to: pre = batch-level gate before dedup,
file = row-level projection/enrichment, post = commit-side reporting.

Every transform is a JVM-side expression composition (no Python UDFs), so
chains stay inside whole-stage codegen.
"""

from __future__ import annotations

import os

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class TransformSpec:
    name: str
    stage: str  # pre | file | post
    category: str
    desc: str
    factory: Callable[..., Transform]
    tags: list[str] = field(default_factory=list)


_REGISTRY: dict[str, TransformSpec] = {}


def register_transform(
    name: str, stage: str, category: str, desc: str, tags: list[str] | None = None
):
    """Decorator: register a transform factory (analog of the hook
    auto-scan, /root/reference/src/fetchez/hooks/registry.py:27-58)."""

    def deco(factory):
        _REGISTRY[name] = TransformSpec(name, stage, category, desc, factory, tags or [])
        return factory

    return deco


def get_transform(name: str, **kwargs) -> Transform:
    if name not in _REGISTRY:
        raise KeyError(f"unknown transform {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name].factory(**kwargs)


def list_transforms(stage: str | None = None) -> list[TransformSpec]:
    specs = sorted(_REGISTRY.values(), key=lambda s: s.name)
    return [s for s in specs if stage is None or s.stage == stage]


def search_transforms(term: str) -> list[TransformSpec]:
    """Full-text search over name/desc/tags (registry.py:1161-1187 analog)."""
    t = term.lower()
    return [
        s
        for s in list_transforms()
        if t in s.name.lower() or t in s.desc.lower() or any(t in x.lower() for x in s.tags)
    ]


def build_chain(chain: list) -> list[Transform]:
    """['name' | {'transform': name, 'args': {...}}] -> transforms, with
    value-equal duplicate elimination (utils.py:447-462 analog)."""
    seen: set[tuple] = set()
    out: list[Transform] = []
    for item in chain or []:
        if isinstance(item, str):
            name, args = item, {}
        else:
            name, args = item["transform"], item.get("args", {})
        key = (name, tuple(sorted(args.items())))
        if key in seen:
            continue
        seen.add(key)
        out.append(get_transform(name, **args))
    return out


# --------------------------------------------------------------------------
# built-ins (each cites the hook it re-expresses)
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# presets: named transform-chain macros (the CLI shortcut -> hook-chain
# compilation, cli.py:652-681, and user preset YAML, presets.py:56-135)
# --------------------------------------------------------------------------
PRESETS: dict[str, list] = {
    # --audit-log -> Checksum(md5) + MetadataEnrich (+ the audit/lineage
    # output the engine always writes), cli.py:674-681
    "audit": ["checksum", "enrich"],
    # --list / --inventory -> plan-only runs, cli.py:652-667
    "plan_only": ["dry_run"],
    # conversational-payload hygiene for transcript streams
    "clean_transcripts": [
        {"transform": "filter_regex", "args": {"column": "text", "pattern": "^\\s*$", "keep": False}},
    ],
}


def load_preset_files(preset_dir: str | None = None) -> list[str]:
    """Merge user preset YAML files into PRESETS (presets.py:56-135: user
    preset files extend/override the built-in table).  Each ``*.yaml`` in
    the dir maps preset name -> transform chain; later files and user
    entries override built-ins of the same name."""
    import yaml

    if preset_dir is None:
        from fetchez_spark.config import preset_dir as _cfg_preset_dir

        preset_dir = _cfg_preset_dir()  # user config file can move it
    loaded: list[str] = []
    if not os.path.isdir(preset_dir):
        return loaded
    for fn in sorted(os.listdir(preset_dir)):
        if not (fn.endswith(".yaml") or fn.endswith(".yml")):
            continue
        with open(os.path.join(preset_dir, fn)) as f:
            data = yaml.safe_load(f) or {}
        if not isinstance(data, dict):
            continue
        for name, chain in data.items():
            if isinstance(chain, list):
                PRESETS[name] = chain
                loaded.append(name)
    return loaded


def expand_presets(chain: list, presets: list[str] | None = None) -> list:
    """Prepend named preset chains (module-scoped presets override global
    by coming first, presets.py:112-125)."""
    expanded: list = []
    for name in presets or []:
        if name not in PRESETS:
            raise KeyError(f"unknown preset {name!r}; known: {sorted(PRESETS)}")
        expanded.extend(PRESETS[name])
    return expanded + list(chain or [])


@register_transform("dry_run", "pre", "pipeline", "empty the batch; plan-only run (dryrun.py:20-27)")
def _dry_run() -> Transform:
    return lambda df: df.limit(0)


@register_transform(
    "filter_regex", "pre", "pipeline",
    "keep/drop rows by regex on a column (fn_filter.py:52-92)", ["filter"],
)
def _filter_regex(column: str = "text", pattern: str = ".*", keep: bool = True) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        m = F.coalesce(F.col(column), F.lit("")).rlike(pattern)
        return df.filter(m if keep else ~m)

    return t


@register_transform(
    "filter_values", "pre", "pipeline",
    "keep rows whose column is in a value list (multibeam.py:176-194 include lists)",
)
def _filter_values(column: str, values: list, keep: bool = True) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        m = F.col(column).isin(list(values))
        return df.filter(m if keep else ~m)

    return t


@register_transform(
    "rename_value", "file", "file_ops",
    "regex substitution on a string column (rename.py:23-58)",
)
def _rename_value(column: str, pattern: str, replacement: str) -> Transform:
    return lambda df: df.withColumn(column, F.regexp_replace(F.col(column), pattern, replacement))


@register_transform(
    "project", "file", "file_ops",
    "keep a subset of columns, preserving the CDC envelope (flatten.py:21-57 re-rooting analog)",
)
def _project(columns: list) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        keep = [c for c in df.columns if c in set(columns) | {"op", "ts", "seq", "src_partition"}]
        return df.select(*keep)

    return t


@register_transform(
    "set_value", "file", "metadata",
    "set/override a column on matching rows (datatype.py:20-48)",
)
def _set_value(column: str, value, where: str | None = None) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        if where:
            return df.withColumn(
                column, F.when(F.expr(where), F.lit(value)).otherwise(F.col(column) if column in df.columns else F.lit(None))
            )
        return df.withColumn(column, F.lit(value))

    return t


@register_transform(
    "apply_rules", "file", "metadata",
    "rule table keyed on a column -> assign a value w/ default (set_weight.py:55-87)",
    ["weight", "case"],
)
def _apply_rules(column: str, rules: dict, output: str = "weight", default=None) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        expr = F.lit(default)
        for k, v in reversed(list(rules.items())):
            expr = F.when(F.col(column) == F.lit(k), F.lit(v)).otherwise(expr)
        return df.withColumn(output, expr)

    return t


@register_transform(
    "enrich", "file", "metadata",
    "add ingest timestamp + engine version columns (enrich.py:24-53)",
)
def _enrich() -> Transform:
    from fetchez_spark import __version__

    return lambda df: df.withColumn("ingested_at", F.current_timestamp()).withColumn(
        "engine_version", F.lit(__version__)
    )


@register_transform(
    "checksum", "file", "metadata",
    "per-row payload hash for final-state verification (checksum.py:60-74)",
)
def _checksum(columns: list | None = None, output: str = "row_hash") -> Transform:
    def t(df: DataFrame) -> DataFrame:
        cols = columns or [c for c in df.columns if c not in ("seq", "src_partition")]
        return df.withColumn(
            output, F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))
        )

    return t


@register_transform(
    "explode_column", "file", "file_ops",
    "one row -> N child rows from an array column, provenance retained (unzip.py:57-215)",
)
def _explode_column(column: str, output: str = "item", keep_source: bool = True) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        out = df.withColumn(output, F.explode(F.col(column)))
        return out if keep_source else out.drop(column)

    return t


@register_transform(
    "console", "post", "pipeline",
    "print a bounded sample of the batch to stdout, pass rows through "
    "unchanged (the `pipe` console-sink hook, pipe.py analog)",
)
def _console(n: int = 20, truncate: bool = True) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        df.show(n=n, truncate=truncate)
        return df

    return t


@register_transform(
    "focus", "file", "file_ops",
    "explode an array column then keep one row per (parent key, item) -- "
    "the focus_sink narrow-to-targets hook (focus.py:42-56)",
)
def _focus(column: str, key: list | None = None, output: str = "item") -> Transform:
    def t(df: DataFrame) -> DataFrame:
        out = df.withColumn(output, F.explode(F.col(column))).drop(column)
        dedup_cols = list(key or [c for c in ("conv_id", "turn_idx") if c in df.columns])
        return out.dropDuplicates(dedup_cols + [output])

    return t


@register_transform(
    "parse_xml", "file", "metadata",
    "parse an XML-string column into a typed struct via from_xml "
    "(JVM-side, the iso_xml metadata-extraction analog, core.py:194-290)",
    ["xml", "metadata", "iso"],
)
def _parse_xml(
    column: str = "xml",
    schema: str = "title STRING, abstract STRING, date STRING",
    output: str = "meta",
    drop_source: bool = False,
) -> Transform:
    """``schema`` is a DDL string for the expected element shape.
    ``from_xml`` runs in the JVM (no Python in the row path) and yields
    null fields for malformed documents -- the lenient-parser behavior of
    the reference's recover=True lxml parse."""

    def t(df: DataFrame) -> DataFrame:
        out = df.withColumn(output, F.from_xml(F.col(column), schema))
        return out.drop(column) if drop_source else out

    return t


@register_transform(
    "xml_metadata", "file", "metadata",
    "extract title/abstract/date from ISO-19115-shaped XML metadata via "
    "namespace-agnostic xpath (iso_xml.title/abstract/date, core.py:241-290)",
    ["xml", "iso19115", "xpath"],
)
def _xml_metadata(column: str = "xml", prefix: str = "meta_") -> Transform:
    """``from_xml`` with the gmd/gco-prefixed nested schema: lenient like
    the reference's ``recover=True`` lxml parse (malformed docs yield
    NULL fields, never a task failure -- Spark's ``xpath_string`` throws
    on malformed XML, which a dirty metadata corpus cannot afford)."""
    iso_schema = (
        "`gmd:identificationInfo` STRUCT<"
        "`gmd:citation`: STRUCT<"
        "`gmd:title`: STRUCT<`gco:CharacterString`: STRING>, "
        "`gmd:date`: STRUCT<`gco:Date`: STRING, `gco:DateTime`: STRING>>, "
        "`gmd:abstract`: STRUCT<`gco:CharacterString`: STRING>>"
    )
    info = "m.`gmd:identificationInfo`"

    def t(df: DataFrame) -> DataFrame:
        parsed = df.withColumn("m", F.from_xml(F.col(column), iso_schema))
        return (
            parsed.withColumn(
                f"{prefix}title",
                F.col(f"{info}.`gmd:citation`.`gmd:title`.`gco:CharacterString`"),
            )
            .withColumn(
                f"{prefix}abstract",
                F.col(f"{info}.`gmd:abstract`.`gco:CharacterString`"),
            )
            .withColumn(
                f"{prefix}date",
                # Date, else DateTime -- the reference's fallback order
                F.coalesce(
                    F.col(f"{info}.`gmd:citation`.`gmd:date`.`gco:Date`"),
                    F.col(f"{info}.`gmd:citation`.`gmd:date`.`gco:DateTime`"),
                ),
            )
            .drop("m")
        )

    return t


@register_transform(
    "exact_dedup", "file", "dedup",
    "drop byte-identical duplicate payloads within the batch (hash-groupBy on a content column)",
    ["dedup", "fingerprint", "md5"],
)
def _exact_dedup(column: str = "text", key: str | None = None) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        from fetchez_spark.operators.dedup import dedup_latest

        order = [c for c in ("ts", "seq") if c in df.columns] or [column]
        return dedup_latest(df, key=[column] if key is None else [key], order=order)

    return t


@register_transform(
    "near_dedup_minhash", "file", "dedup",
    "drop near-duplicate documents via MinHash+LSH banding (jaccard-style shingle similarity)",
    ["dedup", "minhash", "lsh", "jaccard", "near-duplicate"],
)
def _near_dedup_minhash(
    text_col: str = "text", id_col: str = "doc_id", num_hashes: int = 32, bands: int = 8
) -> Transform:
    def t(df: DataFrame) -> DataFrame:
        from fetchez_spark.functions.dedup import minhash_lsh_candidates

        pairs = minhash_lsh_candidates(
            df, text_col=text_col, id_col=id_col, num_hashes=num_hashes, bands=bands
        ).filter(F.col("n_shared_bands") >= 2)
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return df.join(losers, on=id_col, how="left_anti")

    return t


@register_transform(
    "inventory", "post", "metadata",
    "manifest of the planned batch -> JSON/CSV/text dir (inventory.py:25-61; "
    "formats per audit.py:50-81)",
)
def _inventory(out_dir: str, columns: list | None = None, fmt: str = "json") -> Transform:
    if fmt not in ("json", "csv", "text"):
        raise ValueError(f"fmt must be json|csv|text, got {fmt!r}")

    def t(df: DataFrame) -> DataFrame:
        cols = columns or ["op", "conv_id", "turn_idx", "ts", "seq"]
        present = [c for c in cols if c in df.columns]
        out = df.select(*present)
        if fmt == "json":
            out.write.mode("append").json(out_dir)
        elif fmt == "csv":
            out.write.mode("append").option("header", "true").csv(out_dir)
        else:  # text: one pipe-joined line per row (audit.py text writer)
            out.select(
                F.concat_ws("|", *[F.col(c).cast("string") for c in present]).alias("value")
            ).write.mode("append").text(out_dir)
        return df

    return t


def profile_columns(df, cols: list[str] | None = None, approx: bool = False):
    """One-pass column profile -- the dataset-summary companion to
    :func:`inventory` (DuckDB ``SUMMARIZE`` / ``df.summary()`` shape,
    but exact and oracle-checkable): one output row per column with
    ``n_rows``, ``n_nulls``, ``n_distinct``, and for string columns
    ``min_str``/``max_str``/``avg_len`` (rounded to 4 places; null for
    non-string columns, whose min/max would hash differently across
    engines' float formatting).

    Scale shape: ONE aggregate job.  Exact ``count(distinct)`` over k
    columns makes Spark expand each input row k ways before the single
    Exchange -- exact is what an oracle can check, but at the 100 TB
    grain pass ``approx=True`` to swap in ``approx_count_distinct``
    (HLL, no expansion, ~2% error) with everything else unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    cols = list(cols) if cols else list(df.columns)
    nd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    strcols = {c for c in cols if isinstance(df.schema[c].dataType, StringType)}
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"_nd_{c}"))
        if c in strcols:
            aggs.append(F.min(F.col(c)).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"_max_{c}"))
            aggs.append(F.round(F.avg(F.length(F.col(c))), 4).alias(f"_len_{c}"))
    row = df.agg(*aggs)
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    parts = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"_min_{c}") if c in strcols else null_s).alias("min_str"),
            (F.col(f"_max_{c}") if c in strcols else null_s).alias("max_str"),
            (F.col(f"_len_{c}") if c in strcols else null_d).alias("avg_len"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")
