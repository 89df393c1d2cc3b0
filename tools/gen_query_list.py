"""Regenerate QUERIES.md — the registry inventory (name, oracle mode,
one-line description) in driver adjudication order.

Usage: python tools/gen_query_list.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bob_vector_db_spark import queries as Q  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    para = doc.split("\n\n")[0]
    line = " ".join(ln.strip() for ln in para.splitlines())
    return (line[:140] + "…") if len(line) > 140 else line


def main() -> None:
    reg = Q.queries()
    oracles = Q.oracle_sql()
    rows = []
    for name in reg:
        spec = Q.REGISTRY[name]
        mode = "SQL oracle" if name in oracles else "rows-only"
        rows.append((name, mode, first_line(spec.fn)))
    n_oracle = sum(1 for _, m, _ in rows if m == "SQL oracle")
    out = [
        "# Query registry inventory",
        "",
        f"{len(rows)} registered queries — {n_oracle} with a DuckDB SQL "
        "oracle (exact row/schema/value compare), "
        f"{len(rows) - n_oracle} rows-only by declared design (iterative "
        "algorithms, probabilistic candidates, environment-gated codecs).",
        "Listed in driver adjudication order (never-adjudicated first). "
        "Regenerate with `python tools/gen_query_list.py`.",
        "",
        "| # | query | check | what it covers |",
        "|---|---|---|---|",
    ]
    for i, (name, mode, desc) in enumerate(rows, 1):
        out.append(f"| {i} | `{name}` | {mode} | {desc} |")
    with open("/root/repo/QUERIES.md", "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote QUERIES.md: {len(rows)} queries, {n_oracle} oracled")


if __name__ == "__main__":
    main()
