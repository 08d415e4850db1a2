"""Deterministic code-table fixture generator (FIXTURES.md §F1/F2/F4).

Synthesizes two snapshots of ``code_files(repo, path, commit, lang, content)``
plus a ``commits(repo, commit, snapshot_ts)`` dim, with violations injected at
known rows. Golden violation key-sets are derived from the FINAL frames by an
independent pandas oracle (not by replaying the injection bookkeeping), so
tests assert the violations DataFrame bitwise via content sha256
(BASELINE.json:6,15) against a second implementation, not against the
generator's own notes.

Pure pandas/numpy, seed-pinned, absolute timestamps — goldens never rot.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

SEED = 42
EXTS = ["py", "md", "rs", "ts", "c"]
LANG_OF = {"py": "python", "md": "markdown", "rs": "rust", "ts": "typescript", "c": "c"}
EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _sha(s) -> str:
    if s is None or (isinstance(s, float) and np.isnan(s)):
        return EMPTY_SHA256
    return hashlib.sha256(str(s).encode("utf-8")).hexdigest()


def _content(rng: np.random.Generator, mu: float = 6.0, sigma: float = 1.0) -> str:
    n = int(np.clip(rng.lognormal(mu, sigma), 1, 100_000))
    block = "".join(rng.choice(list("abcdefghij "), size=16))
    return (block * (n // 16 + 1))[:n]


@dataclass
class Fixture:
    s1: pd.DataFrame
    s2: pd.DataFrame
    commits: pd.DataFrame
    # golden violation keys per check: set of (repo, path, commit, content_sha)
    golden: dict[str, set] = field(default_factory=dict)


def _golden_from_frames(s2: pd.DataFrame, commits: pd.DataFrame) -> dict[str, set]:
    """Independent pandas oracle over the final frames."""
    df = s2.copy()
    df["content_sha"] = df["content"].map(_sha)
    key_cols = ["repo", "path", "commit", "content_sha"]

    def keys(mask) -> set:
        return set(map(tuple, df.loc[mask, key_cols].itertuples(index=False)))

    sizes = df.groupby(["repo", "path", "commit"])["lang"].transform("size")
    length = df["content"].str.len()
    dim = set(map(tuple, commits[["repo", "commit"]].itertuples(index=False)))
    in_dim = [
        (r, c) in dim for r, c in zip(df["repo"], df["commit"], strict=True)
    ]
    return {
        "uniqueness": keys(sizes > 1),
        "null_content": keys(df["content"].isna()),
        "empty_content": keys(df["content"] == ""),
        "null_lang": keys(df["lang"].isna()),
        "ref_integrity": keys(~np.array(in_dim)),
        # bounds check definition: non-null content with length outside [1, 1e6]
        # (so the injected '' rows trip it too, alongside the V7 outliers)
        "length_outlier": keys(
            df["content"].notna() & ((length < 1) | (length > 1_000_000))
        ),
    }


def generate(n_files: int = 5_000, n_repos: int = 16, seed: int = SEED) -> Fixture:
    rng = np.random.default_rng(seed)
    repos = [f"repo_{i:04d}" for i in range(n_repos)]

    # repo_0000 mega-repo = 50% of rows; rest Zipf(s=1.5) over remaining repos
    weights = np.array([0.5] + list(1.0 / np.arange(1, n_repos) ** 1.5))
    weights[1:] *= 0.5 / weights[1:].sum()
    repo_idx = rng.choice(n_repos, size=n_files, p=weights)

    def commit_set(repo: str, snap: str) -> list[str]:
        k = 1 + int(hashlib.sha256(f"{repo}:{snap}".encode()).hexdigest(), 16) % 5
        return [
            hashlib.sha256(f"{repo}:{snap}:{j}".encode()).hexdigest()[:8]
            for j in range(k)
        ]

    s1_commits = {r: commit_set(r, "s1") for r in repos}
    s2_commits = {r: commit_set(r, "s2") for r in repos}

    rows = []
    n_paths: dict[str, int] = dict.fromkeys(repos, 0)
    for i in range(n_files):
        repo = repos[repo_idx[i]]
        ext = EXTS[int(rng.integers(0, len(EXTS)))]
        d = int(rng.integers(0, 10))
        path = f"dir{d}/file{n_paths[repo]:05d}.{ext}"
        n_paths[repo] += 1
        cset = s1_commits[repo]
        commit = cset[int(rng.integers(0, len(cset)))]
        rows.append((repo, path, commit, LANG_OF[ext], _content(rng)))
    s1 = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    # ---- evolve s1 -> s2: 85% unchanged, 10% modified, 5% deleted, +15% new
    u = rng.random(len(s1))
    unchanged = s1[u < 0.85].copy()
    modified = s1[(u >= 0.85) & (u < 0.95)].copy()
    for j in modified.index:
        repo = modified.at[j, "repo"]
        cset = s2_commits[repo]
        modified.at[j, "commit"] = cset[int(rng.integers(0, len(cset)))]
        modified.at[j, "content"] = _content(rng)
    n_new = int(0.15 * len(s1))
    new_rows = []
    new_repo_idx = rng.choice(n_repos, size=n_new, p=weights)
    for i in range(n_new):
        repo = repos[new_repo_idx[i]]
        ext = EXTS[int(rng.integers(0, len(EXTS)))]
        path = f"dir{int(rng.integers(0, 10))}/new{i:05d}.{ext}"
        cset = s2_commits[repo]
        commit = cset[int(rng.integers(0, len(cset)))]
        new_rows.append((repo, path, commit, LANG_OF[ext], _content(rng)))
    s2 = pd.concat(
        [unchanged, modified, pd.DataFrame(new_rows, columns=s1.columns)],
        ignore_index=True,
    )

    # ---- inject violations (V1-V9, FIXTURES.md §F1)
    n2 = len(s2)
    dup_exact_idx = rng.choice(n2, size=max(2, int(0.005 * n2)), replace=False)
    dups = s2.iloc[dup_exact_idx].copy()  # V1: exact duplicate rows
    dup_diff_idx = rng.choice(
        np.setdiff1d(np.arange(n2), dup_exact_idx),
        size=max(1, int(0.001 * n2)),
        replace=False,
    )
    ddiff = s2.iloc[dup_diff_idx].copy()  # V2: dup key, different content
    for j in ddiff.index:
        ddiff.at[j, "content"] = _content(rng)
    s2 = pd.concat([s2, dups, ddiff], ignore_index=True)

    n2 = len(s2)
    used: set[int] = set(dup_exact_idx.tolist()) | set(dup_diff_idx.tolist())
    used |= set(range(n2 - len(dups) - len(ddiff), n2))

    def pick(frac_or_n) -> list[int]:
        n = frac_or_n if isinstance(frac_or_n, int) else max(1, int(frac_or_n * n2))
        avail = np.setdiff1d(np.arange(n2), np.fromiter(used, int, len(used)))
        sel = rng.choice(avail, size=min(n, len(avail)), replace=False)
        used.update(sel.tolist())
        return sel.tolist()

    for j in pick(0.01):  # V3
        s2.at[j, "content"] = None
    for j in pick(0.005):  # V4
        s2.at[j, "content"] = ""
    for j in pick(0.005):  # V5
        s2.at[j, "lang"] = None
    for j in pick(0.005):  # V6
        s2.at[j, "commit"] = "deadbeef"
    n_outlier = max(5, min(500, n2 // 100))
    for j in pick(n_outlier):  # V7
        s2.at[j, "content"] = "x" * 1_000_001
    # V8 lang-mix drift: repos 7-9, 30% python -> rust
    drift_repos = {f"repo_{i:04d}" for i in (7, 8, 9)}
    mask = s2["repo"].isin(drift_repos) & (s2["lang"] == "python")
    flip = s2[mask].index
    flip = flip[rng.random(len(flip)) < 0.30]
    s2.loc[flip, "lang"] = "rust"
    # V9 length drift: repo_0003 re-drawn with mu=7.0
    m3 = (s2["repo"] == "repo_0003") & ~s2.index.isin(list(used))
    for j in s2[m3].index:
        s2.at[j, "content"] = _content(rng, mu=7.0)

    # ---- commits dim (V6 orphans deliberately absent)
    crows = []
    base1, base2 = pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-16")
    for r in repos:
        for c in s1_commits[r]:
            crows.append((r, c, base1 + pd.Timedelta(days=int(c, 16) % 14)))
        for c in s2_commits[r]:
            crows.append((r, c, base2 + pd.Timedelta(days=int(c, 16) % 14)))
    commits = pd.DataFrame(crows, columns=["repo", "commit", "snapshot_ts"])
    # Spark can't read parquet TIMESTAMP(NANOS); pin to microseconds
    commits["snapshot_ts"] = commits["snapshot_ts"].astype("datetime64[us]")

    return Fixture(
        s1=s1, s2=s2, commits=commits, golden=_golden_from_frames(s2, commits)
    )


def write_fixture(fx: Fixture, root: str) -> None:
    """Write parquet emulating Iceberg snapshots (SURVEY.md §7.4).

    Small row groups so Spark can split the single file across tasks — a
    one-row-group file serializes the whole scan onto one core.
    """
    os.makedirs(root, exist_ok=True)
    kw = {"index": False, "row_group_size": 8192}
    fx.s1.to_parquet(os.path.join(root, "code_files_s1.parquet"), **kw)
    fx.s2.to_parquet(os.path.join(root, "code_files_s2.parquet"), **kw)
    fx.commits.to_parquet(os.path.join(root, "commits.parquet"), **kw)
