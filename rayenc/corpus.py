"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F2/F3).

The engine's native input is a Parquet table of source-code repositories
(repo, path, commit, lang, content — BASELINE.json input_hint). This
module synthesizes it deterministically (seed=42, no wall clock),
mirroring the reference generator's discipline
(/root/reference/scripts/gen_synthetic_data.py:172-188) without copying
its histogram domain:

- F1 ``gen_corpus``: Zipf-skewed repos (one giant repo ~40% of rows →
  exercises the salted-shuffle skew path), paths sorted within repo
  (RLE runs), few commits per repo held over contiguous rows (runs),
  lang keyed off extension (low cardinality → dict), content built from
  templated code lines (log-normal lengths, unicode / empty / near-binary
  rows mixed in).
- F2 ``edge_case_table``: the null/empty/extreme corpus translated from
  the reference's get_rows() (/root/reference/src/vec_pq_reader.rs:563-683).
- F3 ``selector_fixture_columns``: known-best-codec columns for selector
  truth tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANG_BY_EXT = {
    "py": "python",
    "rs": "rust",
    "go": "go",
    "js": "javascript",
    "ts": "typescript",
    "java": "java",
    "c": "c",
    "h": "c",
    "cc": "cpp",
    "rb": "ruby",
    "sh": "shell",
    "md": "markdown",
}

_EXTS = list(LANG_BY_EXT)

_IDENTS = [
    "config", "handler", "parse", "stream", "buffer", "token", "index",
    "batch", "record", "shard", "merge", "apply", "update", "result",
    "value", "offset", "partition", "encode", "decode", "writer", "reader",
]

_TEMPLATES = [
    "def {a}_{b}({c}, {d}=None):",
    "    return {a}.{b}({c}) + {n}",
    "    if {a} is None: raise ValueError('{b}')",
    "for {a} in range({n}):",
    "    {a}[{b}] = {c} * {n}",
    "class {A}{B}:",
    "    '''{a} {b} {c} helper'''",
    "import {a}.{b}",
    "from {a} import {b}, {c}",
    "{a} = {{'{b}': {n}, '{c}': '{d}'}}",
    "// {a} {b} {c} TODO({d})",
    "let {a} = {b}.{c}({n});",
    "fn {a}_{b}({c}: u64) -> u64 {{ {c} + {n} }}",
    "#define {A}_{B} {n}",
    "while ({a} < {n}) {{ {b}++; }}",
]


def _line_pool(rng: np.random.Generator, size: int = 4096) -> np.ndarray:
    ids = rng.choice(_IDENTS, size=(size, 4))
    nums = rng.integers(0, 100000, size=size)
    lines = []
    for (a, b, c, d), n, t in zip(
        ids, nums, rng.integers(0, len(_TEMPLATES), size=size)
    ):
        lines.append(
            _TEMPLATES[t].format(
                a=a, b=b, c=c, d=d, n=n, A=a.capitalize(), B=b.capitalize()
            )
        )
    return np.asarray(lines, dtype=object)


def gen_corpus(
    n_rows: int,
    seed: int = 42,
    n_repos: int = 50,
    giant_frac: float = 0.4,
    median_lines: int = 40,
    max_content_bytes: int = 1 << 20,
) -> pa.Table:
    """Deterministic (repo, path, commit, lang, content) table."""
    rng = np.random.default_rng(seed)
    # --- repos: one giant repo takes ~giant_frac of rows, rest Zipf-ish
    repos = np.array(
        [f"org{i % 7}/project{i}" for i in range(n_repos)], dtype=object
    )
    w = 1.0 / np.arange(2, n_repos + 2) ** 1.2
    w = w / w.sum() * (1 - giant_frac)
    weights = np.concatenate([[giant_frac], w[1:] / w[1:].sum() * (1 - giant_frac)])
    counts = rng.multinomial(n_rows, weights)

    pool = _line_pool(rng)
    repo_col: list[str] = []
    path_col: list[str] = []
    commit_col: list[str] = []
    lang_col: list[str] = []
    contents: list[str] = []

    hexchars = np.array(list("0123456789abcdef"))
    for repo, cnt in zip(repos, counts):
        if cnt == 0:
            continue
        # paths: hierarchical, generated sorted within repo -> shared-prefix runs
        dirs = rng.integers(0, max(2, cnt // 20 + 2), size=cnt)
        files = rng.integers(0, 10**6, size=cnt)
        exts = rng.choice(_EXTS, size=cnt)
        paths = sorted(
            f"src/module{d:03d}/{'sub/' if f % 3 == 0 else ''}file{f:06d}.{e}"
            for d, f, e in zip(dirs, files, exts)
        )
        # commits: few per repo, contiguous row ranges share one commit
        n_commits = max(1, cnt // 50)
        commit_ids = [
            "".join(rng.choice(hexchars, size=40)) for _ in range(n_commits)
        ]
        commit_assign = np.sort(rng.integers(0, n_commits, size=cnt))
        # content: join of random pool lines, log-normal length; the joins
        # run in polars (vectorized group-concat) — a Python join-per-row
        # dominates generation time at bench scales
        n_lines = np.clip(
            rng.lognormal(np.log(median_lines), 1.0, size=cnt).astype(np.int64), 0, None
        )
        contents.extend(_render_contents(rng, pool, n_lines, max_content_bytes))
        for i in range(cnt):
            repo_col.append(repo)
            p = paths[i]
            path_col.append(p)
            commit_col.append(commit_ids[commit_assign[i]])
            lang_col.append(LANG_BY_EXT[p.rsplit(".", 1)[1]])

    # sprinkle deterministic edge rows: empty, unicode, near-binary, huge
    n = len(contents)
    if n >= 8:
        contents[0] = ""
        contents[1] = "días ñoño → λ计算 🚀   end"
        contents[2] = "\x00\x01\x02\xff bin\x7f" * 10
        contents[3] = "x" * min(max_content_bytes, 1 << 18)  # one big near-constant blob
    return pa.table(
        {
            "repo": pa.array(repo_col, type=pa.string()),
            "path": pa.array(path_col, type=pa.string()),
            "commit": pa.array(commit_col, type=pa.string()),
            "lang": pa.array(lang_col, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def _render_contents(
    rng: np.random.Generator,
    pool: np.ndarray,
    n_lines: np.ndarray,
    max_content_bytes: int,
) -> list[str]:
    """Join random pool lines per row, vectorized via polars group-concat."""
    total = int(n_lines.sum())
    if total == 0:
        return [""] * len(n_lines)
    line_idx = rng.integers(0, len(pool), size=total)
    row_ids = np.repeat(np.arange(len(n_lines)), n_lines)
    try:
        import polars as pl

        df = pl.DataFrame(
            {"row": row_ids, "line": pool[line_idx].astype(str)}
        )
        joined = (
            df.group_by("row", maintain_order=True)
            .agg(pl.col("line").str.join("\n"))
            .to_dict(as_series=False)
        )
        by_row = dict(zip(joined["row"], joined["line"]))
    except ImportError:  # pragma: no cover
        by_row = {}
        pos = 0
        for i, k in enumerate(n_lines):
            by_row[i] = "\n".join(pool[line_idx[pos : pos + k]]) if k else ""
            pos += int(k)
    return [
        (by_row.get(i, "") or "")[:max_content_bytes] for i in range(len(n_lines))
    ]


def write_corpus(
    path: str, n_rows: int, seed: int = 42, row_group_size: int = 10_000, **kw
) -> str:
    t = gen_corpus(n_rows, seed=seed, **kw)
    pq.write_table(t, path, row_group_size=row_group_size)
    return path


def edge_case_table() -> pa.Table:
    """F2: the reference get_rows() edge corpus, restated for strings
    (/root/reference/src/vec_pq_reader.rs:563-683 — null vs empty,
    extremes, repeats, unicode, control bytes)."""
    texts = [
        None,                      # null (≠ empty)
        "",                        # empty (≠ null)
        "a",                       # single char
        "repeat", "repeat", "repeat", "repeat",  # run
        "unique-1", "unique-2",    # distinct
        "Z" * 100_000,             # max-length blob
        "πρόγραμμα 语言 🧩",        # multi-byte unicode
        "nul\x00tab\tbell\x07",   # control bytes
        "   \n\t  ",               # whitespace-only
    ]
    n = len(texts)
    return pa.table(
        {
            "repo": pa.array(["edge/repo"] * n),
            "path": pa.array([f"p/{i:02d}.py" for i in range(n)]),
            "commit": pa.array(["c" * 40] * n),
            "lang": pa.array((["python", None] * n)[:n]),
            "content": pa.array(texts, type=pa.string()),
        }
    )


def selector_fixture_columns(n: int = 4096, seed: int = 42) -> dict[str, pa.Array]:
    """F3: columns with a known-best codec family."""
    rng = np.random.default_rng(seed)
    const = pa.array(["same"] * n)
    lowcard = pa.array(rng.choice([f"val{i}" for i in range(8)], size=n).tolist())
    sorted_runs = pa.array(np.sort(rng.integers(0, n // 64, size=n)).astype(str).tolist())
    smallint_text = pa.array([str(x) for x in rng.integers(0, 256, size=n)])
    monotone = pa.array(np.cumsum(rng.integers(1, 5, size=n)).astype(np.int64))
    pool = _line_pool(rng, 512)
    prose = pa.array(
        [" ".join(pool[rng.integers(0, 512, size=3)]) for _ in range(n)]
    )
    random_hex = pa.array(
        ["%032x" % int.from_bytes(rng.bytes(16), "big") for _ in range(n)]
    )
    return {
        "const_col": const,
        "lowcard_col": lowcard,
        "sorted_runs_col": sorted_runs,
        "smallint_text_col": smallint_text,
        "monotone_col": monotone,
        "prose_col": prose,
        "random_hex_col": random_hex,
    }
