"""Independent single-process numpy/scipy oracle (FIXTURES.md §4).

Implements the exact reference semantics documented in SURVEY.md §2.2 /
§2.3, written deliberately differently from the engine (dense arrays,
no partitioning) so agreement is meaningful. Used by tests in place of
the reference's golden files (`python/tests/conftest.py:316-405`).
"""

from __future__ import annotations

import numpy as np


def _csr(edges: np.ndarray, n: int):
    """edges: (E,2) int array → (indptr, indices) sorted by src."""
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    e = edges[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, e[:, 0] + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, e[:, 1], order


def pagerank(
    edges: np.ndarray,
    n: int,
    delta: float = 0.85,
    max_round: int = 10,
    tol=None,
    max_iter: int = 1000,
) -> np.ndarray:
    """Reference-exact (benchmarks/apps/pagerank/pagerank.h, reported
    space): dangling vertices get `base` only; dangling_sum_{t+1} =
    base_t * dangling_vnum."""
    outdeg = np.zeros(n, dtype=np.int64)
    np.add.at(outdeg, edges[:, 0], 1)
    dangling = outdeg == 0
    n_d = int(dangling.sum())
    r = np.full(n, 1.0 / n)
    dangling_sum = n_d / n
    limit = max_iter if tol is not None else max_round
    for _ in range(limit):
        base = (1 - delta) / n + delta * dangling_sum / n
        contrib = np.zeros(n)
        vals = r[edges[:, 0]] / outdeg[edges[:, 0]]
        np.add.at(contrib, edges[:, 1], vals)
        new = delta * contrib + base
        new[dangling] = base
        dangling_sum = base * n_d
        md = np.abs(new - r).max() if n else 0.0
        r = new
        if tol is not None and md < tol:
            break
    return r


def wcc(edges: np.ndarray, n: int) -> np.ndarray:
    """Union-find; component label = min vertex id of the component."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        a, b = find(int(s)), find(int(d))
        if a != b:
            if a < b:
                parent[b] = a
            else:
                parent[a] = b
    labels = np.array([find(i) for i in range(n)])
    # normalize to min member id
    out = np.empty(n, dtype=np.int64)
    for root in np.unique(labels):
        members = np.flatnonzero(labels == root)
        out[members] = members.min()
    return out


def cdlp(edges_undirected: np.ndarray, n: int, max_round: int = 10,
         weights=None) -> np.ndarray:
    """Synchronous most-frequent-neighbor-label, ties → smallest label,
    fixed rounds. ``edges_undirected`` must contain both directions.
    ``weights`` switches votes from counts to weight sums (LPA)."""
    labels = np.arange(n, dtype=np.int64)
    src, dst = edges_undirected[:, 0], edges_undirected[:, 1]
    w = np.ones(len(src)) if weights is None else np.asarray(weights, float)
    for _ in range(max_round):
        lab = labels[src]
        # votes per (dst, label)
        import collections

        votes: dict = collections.defaultdict(float)
        for d, l, ww in zip(dst, lab, w):
            votes[(int(d), int(l))] += ww
        best: dict = {}
        for (d, l), c in votes.items():
            cur = best.get(d)
            if cur is None or c > cur[0] or (c == cur[0] and l < cur[1]):
                best[d] = (c, l)
        new = labels.copy()
        for d, (_, l) in best.items():
            new[d] = l
        labels = new
    return labels


def sssp(edges: np.ndarray, n: int, source: int, weights=None) -> np.ndarray:
    """Bellman-Ford (vectorized relaxation until fixpoint)."""
    w = np.ones(len(edges)) if weights is None else np.asarray(weights, float)
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    src, dst = edges[:, 0], edges[:, 1]
    for _ in range(n + 1):
        cand = dist[src] + w
        new = dist.copy()
        np.minimum.at(new, dst, cand)
        if np.array_equal(new, dist, equal_nan=True):
            break
        dist = new
    return dist


def bfs_depth(edges: np.ndarray, n: int, source: int) -> np.ndarray:
    d = sssp(edges, n, source, weights=np.ones(len(edges)))
    out = np.where(np.isfinite(d), d, -1).astype(np.int64)
    return out


def triangles_per_vertex(edges_uv: np.ndarray, n: int) -> np.ndarray:
    """edges_uv: unique undirected pairs (u < v); neighbor-set
    intersection per edge (pure python; test-scale only)."""
    if len(edges_uv) == 0:
        return np.zeros(n, dtype=np.int64)
    adj = [set() for _ in range(n)]
    for u, v in edges_uv:
        adj[int(u)].add(int(v))
        adj[int(v)].add(int(u))
    tri = np.zeros(n, dtype=np.int64)
    for u, v in edges_uv:
        for w in adj[int(u)] & adj[int(v)]:
            tri[int(u)] += 1
            tri[int(v)] += 1
            tri[w] += 1
    # each triangle increments each of its 3 corners once per edge → /3
    return tri // 3


def kcore_members(edges_uv: np.ndarray, n: int, k: int) -> np.ndarray:
    deg = np.zeros(n, dtype=np.int64)
    adj = [[] for _ in range(n)]
    for u, v in edges_uv:
        adj[int(u)].append(int(v))
        adj[int(v)].append(int(u))
        deg[u] += 1
        deg[v] += 1
    alive = np.ones(n, dtype=bool)
    changed = True
    while changed:
        changed = False
        for v in range(n):
            if alive[v] and deg[v] < k:
                alive[v] = False
                changed = True
                for u in adj[v]:
                    if alive[u]:
                        deg[u] -= 1
    return alive


def louvain(edges_uv: np.ndarray, n: int, weights=None, max_levels: int = 10,
            max_sweeps: int = 10):
    """Slow-loop implementation of the deterministic synchronous Louvain
    spec (graphscope_ray.graph.louvain docstring) — per-vertex python
    loops, written independently of the vectorized engine version."""
    # symmetric row dict
    w_in = (np.ones(len(edges_uv)) if weights is None
            else np.asarray(weights, float))
    rows: dict = {}
    for (u, v), ww in zip(edges_uv, w_in):
        rows[(int(u), int(v))] = rows.get((int(u), int(v)), 0.0) + ww
        rows[(int(v), int(u))] = rows.get((int(v), int(u)), 0.0) + ww
    vids = sorted({x for p in rows for x in p})
    idx = {v: i for i, v in enumerate(vids)}
    nn = len(vids)
    m = sum(rows.values()) / 2.0
    if m == 0:
        vv = np.array(vids, dtype=np.int64)
        return vv, vv.copy(), 0.0

    cur_rows = {(idx[a], idx[b]): ww for (a, b), ww in rows.items()}
    assign = list(range(nn))
    size = nn
    for level in range(max_levels):
        k = [0.0] * size
        adj: dict = {}
        for (a, b), ww in cur_rows.items():
            k[a] += ww
            if a != b:
                adj.setdefault(a, {}).setdefault(b, 0.0)
                adj[a][b] += ww
        comm = list(range(size))
        any_move = False
        for _ in range(max_sweeps):
            moved = 0
            for parity in (0, 1):
                tot = [0.0] * size
                for v in range(size):
                    tot[comm[v]] += k[v]
                pre = list(comm)
                for v in range(size):
                    # level 0: parity by ORIGINAL vid (matches the
                    # engine's dense-vid parity on sparse vid covers)
                    pv = vids[v] % 2 if level == 0 else v % 2
                    if pv != parity:
                        continue
                    kvc: dict = {}
                    for u, ww in adj.get(v, {}).items():
                        kvc[pre[u]] = kvc.get(pre[u], 0.0) + ww
                    d = pre[v]
                    best_c, best_s = None, None
                    for c in sorted(kvc):
                        totc = tot[c] - (k[v] if c == d else 0.0)
                        sc = kvc[c] / m - k[v] * totc / (2 * m * m)
                        if best_s is None or sc > best_s:
                            best_c, best_s = c, sc
                    if best_c is None:
                        continue
                    stay = (kvc.get(d, 0.0) / m
                            - k[v] * (tot[d] - k[v]) / (2 * m * m))
                    if best_c != d and best_s > stay + 1e-12:
                        comm[v] = best_c
                        moved += 1
            if moved == 0:
                break
            any_move = True
        if not any_move:
            break
        uniq = sorted(set(comm))
        remap = {c: i for i, c in enumerate(uniq)}
        assign = [remap[comm[a]] for a in assign]
        new_rows: dict = {}
        for (a, b), ww in cur_rows.items():
            kk2 = (remap[comm[a]], remap[comm[b]])
            new_rows[kk2] = new_rows.get(kk2, 0.0) + ww
        cur_rows = new_rows
        size = len(uniq)
        if size == 1:
            break
    labels = [min(vids[i] for i in range(nn) if assign[i] == c)
              for c in range(size)]
    out = np.array([labels[assign[i]] for i in range(nn)], dtype=np.int64)
    # modularity on contracted graph
    internal = sum(ww for (a, b), ww in cur_rows.items() if a == b)
    tot = [0.0] * size
    for (a, b), ww in cur_rows.items():
        tot[a] += ww
    q = internal / (2 * m) - sum((t / (2 * m)) ** 2 for t in tot)
    return np.array(vids, dtype=np.int64), out, float(q)


def eigenvector(edges: np.ndarray, n: int, tol: float = 1e-6,
                max_round: int = 100) -> np.ndarray:
    """Reference semantics (apps/centrality/eigenvector/...): x' =
    x + A^T x, L2-normalize, stop when Σ|Δ| < n·tol or max_round."""
    x_last = np.full(n, 1.0 / n)
    rounds = 0
    while True:
        x = x_last.copy()
        np.add.at(x, edges[:, 1], x_last[edges[:, 0]])
        x = x / np.sqrt((x * x).sum())
        rounds += 1
        if np.abs(x - x_last).sum() < n * tol or rounds >= max_round:
            return x
        x_last = x


def hits(edges: np.ndarray, n: int, tolerance: float = 0.01,
         max_round: int = 100, normalized: bool = True):
    """Reference semantics (apps/hits/hits.h): auth = Σ_in hub_last,
    hub = Σ_out auth, max-normalize each per step, stop when
    Σ|hub − hub_last| ≤ tolerance or max_round; final sum-normalize."""
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    src, dst = edges[:, 0], edges[:, 1]
    step = 0
    while True:
        hub_last = hub.copy()
        auth = np.zeros(n)
        np.add.at(auth, dst, hub_last[src])
        hub = np.zeros(n)
        np.add.at(hub, src, auth[dst])
        mh, ma = hub.max(initial=0.0), auth.max(initial=0.0)
        if mh > 0:
            hub = hub / mh
        if ma > 0:
            auth = auth / ma
        step += 1
        if np.abs(hub - hub_last).sum() <= tolerance or step >= max_round:
            break
    if normalized:
        if hub.sum():
            hub = hub / hub.sum()
        if auth.sum():
            auth = auth / auth.sum()
    return auth, hub


def katz(edges: np.ndarray, n: int, alpha: float = 0.1, beta: float = 1.0,
         tol: float = 1e-6, max_round: int = 100,
         normalized: bool = True) -> np.ndarray:
    """Reference semantics (apps/centrality/katz/katz_centrality.h):
    x' = α·A^T x + β from x₀=0; stop when Σ|Δ| < n·tol or max_round;
    final L2 normalization when ``normalized``."""
    x_last = np.zeros(n)
    rounds = 0
    while True:
        x = np.zeros(n)
        np.add.at(x, edges[:, 1], x_last[edges[:, 0]])
        x = alpha * x + beta
        rounds += 1
        if np.abs(x - x_last).sum() < n * tol or rounds >= max_round:
            break
        x_last = x
    if normalized:
        x = x / np.sqrt((x * x).sum())
    return x


# ---------------------------------------------------------------------------
# media_pipeline expectation (struct-based, independent of
# graphscope_ray/data/{multimodal,codecs}.py — see tools/gen_media_oracle.py
# history; moved here so the oracle_sql() twin can REGENERATE the
# expectation at check time instead of reading a committed artifact)
# ---------------------------------------------------------------------------

def _bmp_gray_resized(payload: bytes, out_w: int, out_h: int):
    """Grayscale (mean RGB) of the nearest-neighbor-resized 24-bit BMP,
    parsed with struct only (no shared decode code with the engine).
    Returns (gray floats row-major, resized BMP byte size)."""
    import struct
    assert payload[:2] == b"BM"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    assert bpp == 24
    stride = (w * 3 + 3) // 4 * 4
    rows = [(r * h) // out_h for r in range(out_h)]
    cols = [(c * w) // out_w for c in range(out_w)]
    gray = []
    for r in rows:
        # bottom-up storage: display row r lives at file row (h-1-r)
        base = data_off + (h - 1 - r) * stride
        for c in cols:
            o = base + c * 3
            b, g, rr = payload[o], payload[o + 1], payload[o + 2]
            gray.append((float(rr) + float(g) + float(b)) / 3.0)
    out_stride = (out_w * 3 + 3) // 4 * 4
    resized_bytes = 54 + out_stride * out_h
    return gray, resized_bytes


def _wav_abs_samples(payload: bytes):
    import struct
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos = payload.find(b"data")
    n = struct.unpack_from("<I", payload, pos + 4)[0]
    body = payload[pos + 8: pos + 8 + n]
    out = []
    for i in range(0, len(body), 2):
        (s,) = struct.unpack_from("<h", body, i)
        out.append(abs(float(s)) / 32767.0 * 255.0)
    return out


def _np_resize_like(vals, k):
    if not vals:
        return [0.0] * k  # np.resize of an empty array zero-fills
    return [vals[i % len(vals)] for i in range(k)]


def _avi_frames(payload: bytes):
    """Struct-based RIFF/AVI walk (independent of codecs.decode_avi's
    numpy walk): → (list of frames, each a list of h rows of (r,g,b)
    tuples, fps). Only 24-bit BI_RGB '00db'/'00dc' frames."""
    import struct
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "

    def rd32(o):
        return struct.unpack_from("<I", payload, o)[0]

    w = h = None
    scale, rate = 1, 4
    bodies = []
    stack = [(12, len(payload))]
    while stack:
        p, end = stack.pop()
        while p + 8 <= end:
            fcc = payload[p:p + 4]
            sz = rd32(p + 4)
            if fcc == b"LIST":
                stack.append((p + 12, p + 8 + sz))
            elif fcc == b"avih":
                w, h = rd32(p + 8 + 32), rd32(p + 8 + 36)
            elif fcc == b"strh" and payload[p + 8:p + 12] == b"vids":
                scale = rd32(p + 8 + 20) or 1
                rate = rd32(p + 8 + 24) or 4
            elif fcc in (b"00db", b"00dc"):
                bodies.append(payload[p + 8:p + 8 + sz])
            p += 8 + sz + (sz & 1)
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for b in bodies:
        rows = []
        for r in range(h):
            base = (h - 1 - r) * stride  # bottom-up rows
            row = []
            for c in range(w):
                o = base + c * 3
                row.append((b[o + 2], b[o + 1], b[o]))  # BGR → RGB
            rows.append(row)
        frames.append(rows)
    return frames, rate // scale


def media_pipeline_expected(media_table, *, out_w: int, out_h: int,
                            feat_dim: int):
    """Expected (media_id, kind, payload_bytes, dim, feat) rows for the
    resize → decode → feature chain, recomputed from the payload table
    with the struct-based parsers above (video: real AVI parse)."""
    import pandas as pd

    from graphscope_ray.util import round_half_away

    rows = []
    for mid, kind, payload in zip(media_table["media_id"].to_pylist(),
                                  media_table["kind"].to_pylist(),
                                  media_table["payload"].to_pylist()):
        if kind == "image":
            raw, nbytes = _bmp_gray_resized(payload, out_w, out_h)
        elif kind == "audio":
            raw, nbytes = _wav_abs_samples(payload), len(payload)
        else:  # video: REAL struct-based AVI parse (r03 VERDICT #8)
            frames, _fps = _avi_frames(payload)
            raw = [(float(r) + float(g) + float(b)) / 3.0
                   for fr in frames for row in fr for (r, g, b) in row]
            nbytes = len(payload)
        feat = [v / 255.0 for v in _np_resize_like(raw, feat_dim)]
        for dim, f in enumerate(feat):
            rows.append((mid, kind, nbytes, dim,
                         float(round_half_away(np.float64(f), 6))))
    return pd.DataFrame(rows, columns=["media_id", "kind",
                                       "payload_bytes", "dim", "feat"])


def frame_sample_expected(media_table, *, every_ms: int):
    """Expected (media_id, ts_ms, frame_sha256) rows for the REAL
    frame-sampling stage: struct-parse each AVI, pick the frame
    nearest each every_ms timestamp (frame index = ts·fps/1000,
    clamped), re-encode it as a 24-bit BMP with a struct-only writer,
    and sha256 the bytes — fully independent of codecs.py."""
    import hashlib
    import struct

    import pandas as pd

    def bmp_bytes(rows):
        h = len(rows)
        w = len(rows[0])
        stride = (w * 3 + 3) // 4 * 4
        body = bytearray(stride * h)
        for r in range(h):
            base = (h - 1 - r) * stride
            for c, (rr, g, b) in enumerate(rows[r]):
                o = base + c * 3
                body[o], body[o + 1], body[o + 2] = b, g, rr
        head = (b"BM" + struct.pack("<I", 54 + len(body))
                + struct.pack("<HH", 0, 0) + struct.pack("<I", 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(body), 2835, 2835, 0, 0))
        return bytes(head) + bytes(body)

    out = []
    for mid, kind, payload, dur in zip(
            media_table["media_id"].to_pylist(),
            media_table["kind"].to_pylist(),
            media_table["payload"].to_pylist(),
            media_table["duration_ms"].to_pylist()):
        if kind != "video" or not dur:
            continue
        frames, fps = _avi_frames(payload)
        if not frames:
            continue
        for i in range(max(1, dur // every_ms)):
            ts = i * every_ms
            fi = min(len(frames) - 1, ts * fps // 1000)
            digest = hashlib.sha256(bmp_bytes(frames[fi])).hexdigest()
            out.append((mid, ts, digest))
    return pd.DataFrame(out, columns=["media_id", "ts_ms",
                                      "frame_sha256"])
