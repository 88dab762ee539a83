#!/usr/bin/env python3
"""Generate OPERATORS.md — the registry catalog.

One row per registry key: family, one-line semantics (first sentence of
the query's scaladoc), impl anchor (Queries.scala:line), oracle kind,
and the latest per-query bench seconds at sf0.1 (from the newest
BENCH_r*.json that contains the key).

Usage: python3 scripts/gen_operators_md.py   (run from the repo root)
"""
import json
import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = os.path.join(ROOT, "src/main/scala/graft/Queries.scala")
ORACLE = os.path.join(ROOT, "src/main/scala/graft/OracleSql.scala")
OUT = os.path.join(ROOT, "OPERATORS.md")

# prefix -> family, first match wins (order matters: longest first)
FAMILIES = [
    (r"^cp\d", "Corpus pipeline (end-to-end)"),
    (r"^nd\d", "Incremental dedup (persisted indexes)"),
    (r"^d\d", "Deduplication"),
    (r"^dc\d", "Decontamination"),
    (r"^h\d", "HTML / crawl extraction"),
    (r"^(t\d|tt\d|tok\d|ch\d|pii\d|url\d|ld\d|lr\d|sd\d|sr\d|pmi\d)",
     "Text pipeline"),
    (r"^(lm\d|ccn\d|qc\d|ds\d)", "Quality selection (learned/LM)"),
    (r"^(s\d|qz\d|rp\d)", "ANN / similarity"),
    (r"^bm25", "Search / ranking"),
    (r"^(sp\d|sq\d|mix\d)", "Splits / sampling / packing / mixtures"),
    (r"^mm\d", "Multimodal"),
    (r"^(fj\d|er\d)", "Entity resolution / fuzzy matching"),
    (r"^dq\d", "Data quality"),
    (r"^(drift\d|ks\d|ab\d|assoc\d)", "Statistics & drift"),
    (r"^(gini\d|te\d|oh\d|sc\d|fe\d|reg\d)", "ML feature prep"),
    (r"^(ts\d|tm\d|ewma\d|an\d|pop\d)", "Time series"),
    (r"^(scd\d|dv\d)", "Change capture / SCD"),
    (r"^(pr\d|tc\d)", "Graph analytics"),
    (r"^(rfm\d|coh\d|churn\d|fn\d|ar\d)", "Business analytics"),
    (r"^pp\d", "Layout / partition pruning"),
    (r"^(q\d|q_)", "SQL analytics (TPC-H-style)"),
    (r"^(p\d|prof\d)", "Profiling & sketches"),
    (r"^c\d", "Cleaning"),
    (r"^(w\d)", "Windows & sessions"),
    (r"^e\d", "Events / JSON"),
]


def family(name: str) -> str:
    for pat, fam in FAMILIES:
        if re.match(pat, name):
            return fam
    return "Other"


def load_registry(src: str):
    """registry key -> function name, from the Map literal."""
    return dict(re.findall(r'"([a-z0-9_]+)"\s*->\s*\(([A-Za-z0-9]+) _\)', src))


def fn_lines(src: str):
    """function name -> (line number, doc first sentence)."""
    lines = src.split("\n")
    out = {}
    for i, ln in enumerate(lines):
        m = re.match(r"\s+(?:private\[graft\] )?def ([A-Za-z0-9]+)\(", ln)
        if not m:
            continue
        name = m.group(1)
        # walk up to the scaladoc block immediately above
        doc = []
        j = i - 1
        while j >= 0 and lines[j].strip().startswith(("*", "/**", "*/")):
            doc.append(lines[j].strip().lstrip("/*").strip())
            if lines[j].strip().startswith("/**"):
                break
            j -= 1
        doc.reverse()
        text = " ".join(d for d in doc if d)
        text = re.sub(r"\[\[([^\]]*)\]\]", r"`\1`", text)
        text = re.sub(r"\s+", " ", text).strip()
        # drop the "XX:" label prefix, keep the first sentence
        text = re.sub(r"^[A-Za-z0-9_]+:\s*", "", text)
        first = re.split(r"(?<=[.!?])\s", text, maxsplit=1)[0] if text else ""
        out[name] = (i + 1, first)
    return out


def oracle_kinds(oracle_src: str):
    """key -> oracle kind (hash / gate / shared-reference)."""
    kinds = {}
    # shared-by-reference rows:  "x" -> sql0("y")
    for k, ref in re.findall(r'"([a-z0-9_]+)"\s*->\s*sql0\("([a-z0-9_]+)"\)',
                             oracle_src):
        kinds[k] = f"hash (shares {ref})"
    # rows whose SQL pins a recall gate
    for m in re.finditer(r'"([a-z0-9_]+)"\s*->', oracle_src):
        k = m.group(1)
        if k in kinds:
            continue
        tail = oracle_src[m.end():m.end() + 2000]
        kinds[k] = ("recall gate (pinned TRUE)"
                    if "recall_ok" in tail else "hash")
    return kinds


def bench_numbers():
    """key -> (seconds, round label) from the newest bench containing it.

    The driver stores only the LAST ~2000 chars of Bench's JSON line in a
    "tail" field, so early-alphabet keys can be missing from any single
    round — regex the per-query pairs out of whatever survived, letting
    newer rounds overwrite older ones.
    """
    out = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        label = re.search(r"BENCH_(r\d+)", path).group(1)
        try:
            data = json.load(open(path))
        except Exception:
            continue
        blob = data.get("tail", "") if isinstance(data, dict) else ""
        if isinstance(data, dict) and "queries" in data:
            for k, v in data["queries"].items():
                out[k] = (v, label)
        for k, v in re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)', blob):
            out[k] = (float(v), label)
    return out


def main():
    src = open(QUERIES).read()
    osrc = open(ORACLE).read()
    reg = load_registry(src)
    fns = fn_lines(src)
    kinds = oracle_kinds(osrc)
    bench = bench_numbers()

    rows = []
    for key in sorted(reg):
        fn = reg[key]
        line, doc = fns.get(fn, (0, ""))
        sec = bench.get(key)
        secs = f"{sec[0]:.2f} ({sec[1]})" if sec else "—"
        rows.append((family(key), key, doc, f"Queries.scala:{line}",
                     kinds.get(key, "hash"), secs))

    fams = {}
    for r in rows:
        fams.setdefault(r[0], []).append(r)

    with open(OUT, "w") as f:
        f.write("# OPERATORS — generated registry catalog\n\n")
        f.write(f"{len(rows)} oracle-checked registry queries. "
                "Regenerate with `python3 scripts/gen_operators_md.py` "
                "(parses Queries.scala docs, OracleSql.scala, and the "
                "newest BENCH_r*.json per key). Per-query seconds are "
                "sf0.1 on local[32], min-of-2 timed passes after an "
                "untimed warm-up (r11+).\n\n")
        for fam in sorted(fams):
            f.write(f"## {fam}\n\n")
            f.write("| query | semantics | impl | oracle | sf0.1 s |\n")
            f.write("|---|---|---|---|---|\n")
            for _, key, doc, anchor, kind, secs in fams[fam]:
                doc = doc.replace("|", "\\|")
                f.write(f"| `{key}` | {doc} | {anchor} | {kind} | {secs} |\n")
            f.write("\n")
    print(f"wrote {OUT}: {len(rows)} rows, {len(fams)} families")
    missing = [k for k in reg if reg[k] not in fns]
    if missing:
        print(f"WARNING: no def found for {missing}", file=sys.stderr)


if __name__ == "__main__":
    main()
