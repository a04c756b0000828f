"""App-result contexts with the reference's selector language.

Re-expresses the reference's context zoo — ``VertexDataContext``,
``VertexPropertyContext``, ``LabeledVertexDataContext``,
``LabeledVertexPropertyContext`` and their selector grammar
(`python/graphscope/framework/context.py:275-393`,
`python/graphscope/framework/utils.py` transform_*_selector) — as
pushed-down Ray Data filters + broadcast-or-shuffle column attachment.
One class covers all four: the presence of a labeled vertex table
enables the ``:label`` forms, and multi-column results enable the
``r.col`` forms.

Selector grammar (dict values or a single string):

- ``v.id``            oid of each result vertex
- ``v.data``          a vertex property (property name ``data``)
- ``v.<prop>``        any vertex property from the vertex table
- ``r``               the single result column
- ``r.<col>``         a named result column (property contexts)
- ``v:<label>.id`` / ``v:<label>.<prop>`` / ``r:<label>`` /
  ``r:<label>.<col>``  the same, restricted to vertices of a label

``vertex_range={'begin': m, 'end': n}`` slices on oid order (native
ordering of the oid type; the reference compares oids the same way —
alphabetic for string oids, numeric for int64).

Everything stays a Dataset until ``to_dataframe``/``to_numpy``; label
restriction is a pushed-down expression filter and property/oid
attachment uses joins.attach_values (broadcast under threshold, hash
join above), so selection never materializes O(V) rows on the driver.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

import ray.data

from graphscope_ray.graph.joins import attach_values


def _set_col(t: pa.Table, name: str, col) -> pa.Table:
    """Replace-or-append (an output name may equal its source column,
    e.g. selecting {'rank': 'r.rank'})."""
    if name in t.schema.names:
        return t.set_column(t.schema.get_field_index(name), name, col)
    return t.append_column(name, col)


def _parse(selector: str):
    """'v:person.id' → ('v', 'person', 'id'); 'r' → ('r', None, None)."""
    head, dot, prop = selector.partition(".")
    kind, colon, label = head.partition(":")
    if kind not in ("v", "r", "e"):
        raise ValueError(f"bad selector {selector!r}: must start v/r/e")
    return kind, (label if colon else None), (prop if dot else None)


class Context:
    """Result context over ``result`` (a Dataset keyed by ``vid``).

    ``vertices``: optional vertex table Dataset ``(vid, label?,
    props...)`` enabling ``v.<prop>`` and every ``:label`` form.
    """

    def __init__(self, graph, result: ray.data.Dataset, *,
                 vertices: Optional[ray.data.Dataset] = None,
                 label_col: str = "label"):
        self.graph = graph
        self.result = result
        self.vertices = vertices
        self.label_col = label_col
        self._result_cols = [c for c in result.schema().names if c != "vid"]

    # -- selector resolution ------------------------------------------

    def _label_filter(self, ds: ray.data.Dataset,
                      label: str) -> ray.data.Dataset:
        if self.vertices is None:
            raise ValueError("labeled selector on an unlabeled context")
        lab = self.vertices.select_columns(["vid", self.label_col])
        ds = attach_values(ds, lab, on="vid", table_key="vid",
                           value_names=[self.label_col],
                           defaults={self.label_col: ""})
        return (ds.filter(expr=f"{self.label_col} == {label!r}")
                .drop_columns([self.label_col]))

    def _attach_oid(self, ds: ray.data.Dataset,
                    out: str) -> ray.data.Dataset:
        from graphscope_ray.util import rename
        g = self.graph
        if g.idmap is None:  # vid-space graph: oid == vid
            def copy_vid(t: pa.Table) -> pa.Table:
                return _set_col(t, out, t["vid"])
            return ds.map_batches(copy_vid, batch_format="pyarrow")
        idmap = rename(g.idmap, {"oid": out})
        return attach_values(ds, idmap, on="vid", table_key="vid",
                             value_names=[out],
                             table_count=g.idmap_count)

    def _attach_prop(self, ds: ray.data.Dataset, prop: str,
                     out: str) -> ray.data.Dataset:
        if self.vertices is None:
            raise ValueError(f"v.{prop}: context has no vertex table")
        from graphscope_ray.util import rename
        tab = rename(self.vertices.select_columns(["vid", prop]),
                     {prop: out})
        return attach_values(ds, tab, on="vid", table_key="vid",
                             value_names=[out])

    def select(self, selector: Union[str, dict],
               vertex_range: Optional[dict] = None) -> ray.data.Dataset:
        """→ Dataset with one column per selector entry (plus nothing
        else), one row per selected vertex."""
        if isinstance(selector, str):
            selector = {"_0": selector}
        parsed = {out: _parse(s) for out, s in selector.items()}
        labels = {lab for _, lab, _ in parsed.values() if lab is not None}
        if len(labels) > 1:
            raise ValueError(f"selectors mix labels {sorted(labels)}; "
                             "one label per selection (reference "
                             "semantics: columns are row-aligned)")
        ds = self.result
        if labels:
            ds = self._label_filter(ds, labels.pop())
        if vertex_range:
            ds = self._attach_oid(ds, "_oid")
            lo, hi = vertex_range.get("begin"), vertex_range.get("end")
            lit = (repr if isinstance(
                (lo if lo is not None else hi), str) else int)
            if lo is not None:
                ds = ds.filter(expr=f"_oid >= {lit(lo)}")
            if hi is not None:
                ds = ds.filter(expr=f"_oid < {lit(hi)}")
            ds = ds.drop_columns(["_oid"])
        for out, (kind, _lab, prop) in parsed.items():
            if kind == "e":
                raise NotImplementedError(
                    "edge selectors need the edge table — use "
                    "Graph/store edge Datasets directly")
            if kind == "v":
                if prop in (None, "id"):
                    ds = self._attach_oid(ds, out)
                else:
                    ds = self._attach_prop(ds, prop, out)
            else:  # r
                col = prop
                if col is None:
                    if len(self._result_cols) != 1:
                        raise ValueError(
                            f"'r' is ambiguous over {self._result_cols}; "
                            "use r.<col>")
                    col = self._result_cols[0]
                if col not in self._result_cols:
                    raise KeyError(f"result has no column {col!r}")

                def take(t: pa.Table, _c=col, _o=out) -> pa.Table:
                    return _set_col(t, _o, t[_c])

                ds = ds.map_batches(take, batch_format="pyarrow")
        return ds.select_columns(list(parsed.keys()))

    def select_by_label(self, labels, selectors,
                        label_out: str = "label") -> ray.data.Dataset:
        """Per-label result columns from ONE app run (reference
        ``apps/property/property_pagerank.h`` fills a
        ``LabeledVertexPropertyContext`` column per label in a single
        compute): for each label, resolve ``selectors`` (values may
        contain ``{label}`` placeholders, e.g. ``'r:{label}'``) and
        stack the row blocks into one Dataset with a literal
        ``label_out`` column. The app result is read once per label
        but the APP ITSELF ran once — this is the selection pass."""
        parts = []
        for lab in labels:
            sel = {out: s.format(label=lab)
                   for out, s in selectors.items()}
            ds = self.select(sel)

            def stamp(t: pa.Table, _l=lab) -> pa.Table:
                return t.append_column(
                    label_out, pa.array([_l] * len(t), pa.string()))

            parts.append(ds.map_batches(stamp, batch_format="pyarrow"))
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out

    # -- reference-named accessors ------------------------------------

    def to_dataset(self, selector, vertex_range=None) -> ray.data.Dataset:
        return self.select(selector, vertex_range)

    def to_dataframe(self, selector, vertex_range=None):
        """Driver-side frame — small results only, like the
        reference's output_to_client."""
        return self.select(selector, vertex_range).to_pandas()

    def to_numpy(self, selector: str, vertex_range=None) -> np.ndarray:
        df = self.to_dataframe({"_0": selector}, vertex_range)
        return df["_0"].to_numpy()

    def output(self, path: str, selector, vertex_range=None,
               **kw) -> None:
        """Parquet sink for a selection (the reference's output(fd)
        writes through vineyard streams; here the Dataset writes
        partitioned parquet directly)."""
        self.select(selector, vertex_range).write_parquet(path, **kw)
