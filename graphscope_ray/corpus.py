"""Deterministic synthetic source-code corpus (the engine's flagship input).

Schema per BASELINE.json ``input_hint``: one row per (file, commit)
occurrence with columns ``(repo: string, path: string, commit: string,
lang: string, content: string)``.

Generation rules follow FIXTURES.md §1: Zipf-ish repo sizes (skew), a
small pool of *common paths* shared across many repos/commits (hub
vertices), long-tailed commits-per-repo, and content strings duplicated
across rows so sha256 groups are nontrivial. Fully deterministic for a
given ``(n_files, seed)`` — independent of parallelism, platform and
dict ordering.

This module is a test/bench fixture generator, not a hot path; it runs
driver-side with numpy and writes a single parquet file.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EXT_LANG = [
    ("py", "python"),
    ("rs", "rust"),
    ("go", "go"),
    ("js", "javascript"),
    ("c", "c"),
    ("md", "markdown"),
]

_COMMON_PATHS = [
    "README.md",
    "Makefile",
    "LICENSE",
    "setup.py",
    ".gitignore",
    "src/main.py",
    "src/lib.rs",
    "docs/index.md",
]

_WORDS = (
    "def class import return fn let mut pub struct impl for while if else "
    "match type interface func package var const static void int float "
    "string bool map list vec hash sort merge scan filter reduce batch "
    "graph vertex edge rank label component triangle partition shuffle"
).split()


def synth_corpus_table(n_files: int = 1000, seed: int = 42) -> pa.Table:
    """Build the corpus as a pyarrow Table (one row per file-commit pair)."""
    rng = np.random.default_rng(seed)
    n_repos = max(2, n_files // 20)

    # Zipf-ish repo assignment → skewed repo sizes (some repos are huge).
    repo_of_file = (rng.zipf(1.4, size=n_files) - 1) % n_repos
    repo_of_file.sort()  # files grouped by repo; deterministic

    # Commits per repo: long-tailed, at least 2.
    commits_per_repo = 2 + ((rng.zipf(1.6, size=n_repos) - 1) % 30)

    repo_names = np.array([f"org{r // 17}/repo{r}" for r in range(n_repos)])

    # Paths: ~12% of files use a common path (hub vertices across repos
    # when combined with same-repo co-occurrence they become dense rows).
    is_common = rng.random(n_files) < 0.12
    exts = rng.integers(0, len(_EXT_LANG), size=n_files)
    paths = np.empty(n_files, dtype=object)
    langs = np.empty(n_files, dtype=object)
    common_idx = rng.integers(0, len(_COMMON_PATHS), size=n_files)
    for i in range(n_files):
        if is_common[i]:
            p = _COMMON_PATHS[common_idx[i]]
            paths[i] = p
            ext = p.rsplit(".", 1)[-1] if "." in p else "md"
            langs[i] = dict(_EXT_LANG).get(ext, "text")
        else:
            ext, lang = _EXT_LANG[exts[i]]
            paths[i] = f"src/d{i % 7}/f{i}.{ext}"
            langs[i] = lang

    # Content pool half the size of the file count → forced sha256 dups.
    pool = max(1, n_files // 2)
    content_id = rng.integers(0, pool, size=n_files)
    pool_texts = []
    for c in range(pool):
        crng = np.random.default_rng(seed * 1_000_003 + c)
        n_words = 8 + int(crng.integers(0, 40))
        ws = crng.integers(0, len(_WORDS), size=n_words)
        pool_texts.append(" ".join(_WORDS[w] for w in ws) + f"  # blob{c}")

    # Occurrences: file i appears in 1 + (i % 3) distinct commits of its
    # repo, chosen deterministically by a per-file stride.
    repos_o, paths_o, commits_o, langs_o, contents_o = [], [], [], [], []
    for i in range(n_files):
        r = int(repo_of_file[i])
        cpr = int(commits_per_repo[r])
        n_occ = min(cpr, 1 + (i % 3))
        start = i % cpr
        stride = 1 + (i % 5)
        seen = set()
        for k in range(n_occ):
            c = (start + k * stride) % cpr
            if c in seen:
                continue
            seen.add(c)
            repos_o.append(repo_names[r])
            paths_o.append(paths[i])
            commits_o.append(
                hashlib.sha1(f"{repo_names[r]}:{c}".encode()).hexdigest()
            )
            langs_o.append(langs[i])
            contents_o.append(pool_texts[int(content_id[i])])

    return pa.table(
        {
            "repo": pa.array(repos_o, pa.string()),
            "path": pa.array(paths_o, pa.string()),
            "commit": pa.array(commits_o, pa.string()),
            "lang": pa.array(langs_o, pa.string()),
            "content": pa.array(contents_o, pa.string()),
        }
    )


def write_corpus(path: str, n_files: int = 1000, seed: int = 42,
                 row_group_size: int = 32_768) -> str:
    """Write the synthetic corpus to ``path`` (a .parquet file). Idempotent
    per (n_files, seed, row_group_size): existing file with matching footer
    metadata is reused so repeated test/bench runs skip regeneration.

    ``row_group_size`` bounds parquet row groups so ``read_parquet``
    yields one block per group — a single-row-group file reads as ONE
    Ray Data block and serializes every downstream ``map_batches``
    stage (the sha256 invariant pass most of all) no matter how many
    CPUs the cluster has."""
    meta_key = (f"n_files={n_files};seed={seed};"
                f"rg={row_group_size}").encode()
    if os.path.exists(path):
        try:
            existing = pq.read_schema(path).metadata or {}
            if existing.get(b"graphscope_ray_corpus") == meta_key:
                return path
        except Exception:
            pass
    tbl = synth_corpus_table(n_files, seed)
    tbl = tbl.replace_schema_metadata({b"graphscope_ray_corpus": meta_key})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(tbl, path, row_group_size=row_group_size)
    return path
