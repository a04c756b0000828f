"""Sources / sinks — the engine's loader surface.

Mirrors the reference's ``Loader`` + ``CSVOptions`` capabilities
(`/root/reference/python/graphscope/framework/loader.py:43-90`:
delimiter, header toggle, column selection) over Ray Data readers, and
the ADD_LABELS multi-label recipe
(`python/graphscope/framework/graph.py:737-855`) as a documented
union-with-label-column helper — the single-label engine's equivalent
of a labeled property graph.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data


def read_csv(
    paths,
    *,
    delimiter: str = ",",
    header: bool = True,
    column_names: Optional[Sequence[str]] = None,
    columns: Optional[Sequence[str]] = None,
    **kw,
) -> ray.data.Dataset:
    """CSV source with the reference's CSVOptions knobs.

    ``header=False`` requires ``column_names`` (like the reference's
    ``header_row=False`` + explicit column list); ``columns`` projects
    after parse (arrow pushes it into the block parse)."""
    parse = pacsv.ParseOptions(delimiter=delimiter)
    if header:
        read = pacsv.ReadOptions()
    else:
        if not column_names:
            raise ValueError("header=False requires column_names")
        read = pacsv.ReadOptions(column_names=list(column_names))
    convert = pacsv.ConvertOptions(
        include_columns=list(columns) if columns else None)
    ds = ray.data.read_csv(paths, parse_options=parse, read_options=read,
                           convert_options=convert, **kw)
    return ds


def read_parquet(paths, *, columns=None, **kw) -> ray.data.Dataset:
    """Parquet source (column-pruned at the read — never load columns
    a 2-column transform doesn't need)."""
    return ray.data.read_parquet(paths, columns=columns, **kw)


def write_parquet(ds: ray.data.Dataset, path: str, *,
                  partition_cols=None, **kw) -> None:
    """Resumable partitioned sink (one directory per partition key so
    a failed run skips finished partitions; never one giant file)."""
    ds.write_parquet(path, partition_cols=partition_cols, **kw)


def write_csv(ds: ray.data.Dataset, path: str, **kw) -> None:
    """CSV sink (the reference's ``context.to_csv`` /
    ``output(fd='file://...')`` surface, `framework/context.py:269-272`)."""
    ds.write_csv(path, **kw)


def write_context(ds: ray.data.Dataset, uri: str, *,
                  partition_cols=None, **kw) -> None:
    """Context/result sink by URI — the analogue of the reference's
    ``Context.output(fd=...)`` through vineyard dataframe streams
    (`framework/context.py:208-267`: file://, oss://, hdfs://).

    ``file://`` (or a bare path) writes locally; any other scheme is
    handed to ``pyarrow.fs`` resolution (S3 ships with pyarrow; HDFS
    needs libhdfs) — unresolvable schemes raise with the dependency
    named rather than failing deep in a write task. Format picks by
    extension: ``.csv`` → CSV, anything else → partitioned Parquet."""
    scheme, _, rest = uri.partition("://")
    if not rest:          # bare path
        scheme, rest = "file", uri
    if scheme == "file":
        if rest.endswith(".csv"):
            ds.write_csv(rest, **kw)
        else:
            ds.write_parquet(rest, partition_cols=partition_cols, **kw)
        return
    try:
        from pyarrow import fs as pafs
        filesystem, path = pafs.FileSystem.from_uri(uri)
    except Exception as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            f"remote sink scheme {scheme!r} needs a pyarrow.fs "
            f"filesystem this environment can resolve: {exc}") from exc
    if path.endswith(".csv"):
        ds.write_csv(path, filesystem=filesystem, **kw)
    else:
        ds.write_parquet(path, filesystem=filesystem,
                         partition_cols=partition_cols, **kw)


def add_labels(
    labeled: dict[str, ray.data.Dataset],
    label_col: str = "label",
) -> ray.data.Dataset:
    """ADD_LABELS recipe (`graph.py:737-855`): union several per-label
    tables into one Dataset with a ``label`` discriminator column —
    the single-label engine's multi-label property graph. Downstream,
    `PROJECT_TO_SIMPLE` is a ``filter`` on the label column."""
    parts = []
    for label, ds in labeled.items():
        def tag(t: pa.Table, _label=label) -> pa.Table:
            return t.append_column(
                label_col, pa.array([_label] * len(t), pa.string()))
        parts.append(ds.map_batches(tag, batch_format="pyarrow"))
    if not parts:
        raise ValueError("no label tables given")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def project_label(ds: ray.data.Dataset, label: str,
                  label_col: str = "label") -> ray.data.Dataset:
    """PROJECT_TO_SIMPLE over an add_labels table: one (label) slice
    with the discriminator dropped (`graph.py:857-916`)."""
    return (ds.filter(expr=f"{label_col} == '{label}'")
            .drop_columns([label_col]))
