#!/usr/bin/env python3
"""Failure-cause histogram over tools/sweep_residual.sh range logs.

Usage: python3 tools/failure_histogram.py /tmp/sweep_r13 [curated.txt]
Classifies each FAIL line's reason into a construct bucket and prints
buckets by count, with a few sample test names each — the work-list for
the next dialect/semantics enablers.
"""
import glob
import re
import sys
from collections import Counter, defaultdict

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r13"
curated_path = (
    sys.argv[2] if len(sys.argv) > 2
    else "src/test/resources/reference_anchors.txt"
)
curated = set()
try:
    curated = {
        line.strip()
        for line in open(curated_path)
        if line.strip() and not line.startswith("#")
    }
except OSError:
    pass

RULES = [
    # (bucket, regex on the reason text)
    ("missing-table test.hits/other db", r"TABLE_OR_VIEW_NOT_FOUND.*`(test|datasets)`"),
    ("missing table/view (local)", r"TABLE_OR_VIEW_NOT_FOUND"),
    ("unresolved function", r"UNRESOLVED_ROUTINE.*routine `([A-Za-z0-9_]+)`"),
    ("unresolved column/alias", r"UNRESOLVED_COLUMN|UNRESOLVED_FIELD|MISSING_ATTRIBUTES"),
    ("parse error", r"PARSE_SYNTAX_ERROR|ParseException|mismatched input"),
    ("datatype mismatch", r"DATATYPE_MISMATCH|CANNOT_RESOLVE|INVALID_ORDINAL"),
    ("must-fail did not fail", r"expected failure did not fail"),
    ("unexpectedly failed (we error, CH passes)", r"(?i)unexpected"),
    ("output diff", r"(?i)mismatch|diff|expected .* got"),
    ("ambiguous reference", r"AMBIGUOUS_REFERENCE|AMBIGUOUS_COLUMN"),
    ("internal error", r"INTERNAL_ERROR"),
    ("cast/overflow", r"CAST_INVALID_INPUT|ARITHMETIC_OVERFLOW|NUMERIC_VALUE_OUT_OF_RANGE"),
    ("div by zero", r"DIVIDE_BY_ZERO"),
    ("subquery/correlation", r"UNSUPPORTED_SUBQUERY|CORRELATED"),
    ("window/group semantics", r"MISSING_GROUP_BY|not in GROUP BY|window"),
]


DIFF_RE = re.compile(r"diff at line \d+: got (.*) want (.*)$")


def classify_diff(got, want):
    """Sub-classify an output diff by its first diverging line."""
    got, want = got.strip(), want.strip()
    if got == "<eof>" or want == "<eof>":
        return "diff: row count"
    g, w = got.split("\t"), want.split("\t")
    if len(g) != len(w):
        return "diff: column count"
    causes = set()
    for a, b in zip(g, w):
        if a == b:
            continue
        if (a == r"\N") != (b == r"\N"):
            causes.add("null-vs-value")
            continue
        try:
            fa, fb = float(a), float(b)
            if fa == fb:
                causes.add("float formatting")
            elif abs(fa - fb) <= 1e-6 * max(1.0, abs(fb)):
                causes.add("float near-equal")
            else:
                causes.add("numeric value")
            continue
        except ValueError:
            pass
        if a.replace("'", '"') == b.replace("'", '"'):
            causes.add("quote style")
        elif re.sub(r"\s+", "", a) == re.sub(r"\s+", "", b):
            causes.add("whitespace")
        elif re.search(r"\d{4}-\d{2}-\d{2}", a) and re.search(r"\d{4}-\d{2}-\d{2}", b):
            causes.add("datetime rendering")
        elif a.startswith("[") and b.startswith("["):
            causes.add("array rendering")
        else:
            causes.add("string value")
    if not causes:
        return "diff: trailing-line"
    return "diff: " + "+".join(sorted(causes))


def classify(reason):
    if reason.startswith("diff: ROW ORDER"):
        return "diff: row order only", None
    m = DIFF_RE.search(reason)
    if m:
        return classify_diff(m.group(1), m.group(2)), None
    for bucket, rx in RULES:
        if re.search(rx, reason):
            m = re.search(r"routine `([A-Za-z0-9_]+)`", reason)
            if bucket == "unresolved function" and m:
                return bucket, m.group(1)
            return bucket, None
    return "other: " + reason[:60], None


buckets = Counter()
samples = defaultdict(list)
fns = Counter()
n_pass = n_fail = n_curated_fail = 0
for log in sorted(glob.glob(f"{out}/range_*.log")):
    for line in open(log, errors="replace"):
        if line.startswith("PASS "):
            n_pass += 1
        elif line.startswith("FAIL "):
            n_fail += 1
            name, _, reason = line[5:].partition(" :: ")
            name = name.strip()
            if name in curated:
                n_curated_fail += 1
                print(f"!! CURATED FAIL: {name} :: {reason.strip()[:120]}")
            b, fn = classify(reason.strip())
            buckets[b] += 1
            if fn:
                fns[fn] += 1
            if len(samples[b]) < 6:
                samples[b].append(name)

print(f"\n== {n_pass} pass / {n_fail} fail; curated fails: {n_curated_fail} ==\n")
for b, n in buckets.most_common(40):
    print(f"{n:5d}  {b}")
    print(f"       e.g. {', '.join(samples[b][:4])}")
if fns:
    print("\nTop unresolved functions:")
    for fn, n in fns.most_common(30):
        print(f"{n:5d}  {fn}")
