#!/usr/bin/env python
"""One-command per-family recipe table (VERDICT r4 item 8).

Runs each family's documented best recipe (the same ``bench.VARIANTS``
rows the driver bench measures) in a fresh subprocess and emits ONE
consolidated JSON document — so future rounds read the family table from
an artifact instead of re-deriving recipes from IMPLEMENTATION_NOTES
prose. The headline (paligemma bf16) row can be included with
``--headline``.

Usage:
    python scripts/bench_families.py [--out FAMILIES.json] [--headline]
        [--budget-s 4500]

Each row carries both prompt regimes where the recipe defines them
(byte-fallback ids=0 and realistic ids=60; see bench.py docstring).
Stdout gets the consolidated JSON (one line); progress goes to stderr.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from bench import VARIANT_KNOB_DEFAULTS, VARIANTS  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(env_overrides: dict, budget_s: float) -> dict:
    env = dict(os.environ)
    env.update(VARIANT_KNOB_DEFAULTS)
    env.update(env_overrides)
    env = {k: v for k, v in env.items() if v != ""}
    env.update({
        "VLM_TPU_BENCH_VARIANTS": "0",
        "VLM_TPU_BENCH_SEQ_N": "0",
        "VLM_TPU_BENCH_WAVE": "0",
        "VLM_TPU_BENCH_BUDGET_S": f"{budget_s:.0f}",
    })
    t0 = time.perf_counter()
    # SIGTERM-first deadline (same as bench.run_variants): the child's
    # internal budget only stops it STARTING new reps/regimes — a cold
    # compile can overshoot it by minutes, and a subprocess.run timeout
    # would SIGKILL, losing the partial JSON the child's handler emits.
    stdout_text, stderr_text, err = "", "", None
    proc = subprocess.Popen(
        [sys.executable, str(REPO_ROOT / "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        stdout_text, stderr_text = proc.communicate(timeout=budget_s + 180)
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            stdout_text, stderr_text = proc.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
            stdout_text, stderr_text = proc.communicate()
        err = "deadline (SIGTERM)"
    try:
        line = stdout_text.strip().splitlines()[-1]
        row = json.loads(line)
        if err:
            row["deadline_hit"] = err
    except Exception as e:  # noqa: BLE001 — degrade row-by-row
        tail = stderr_text.strip().splitlines()[-1][:300] \
            if stderr_text.strip() else ""
        row = {"error": err or f"{type(e).__name__}: {e}"[:300],
               "stderr_tail": tail}
    row["wall_s"] = round(time.perf_counter() - t0, 1)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO_ROOT / "FAMILIES.json"))
    ap.add_argument("--headline", action="store_true",
                    help="also measure the paligemma bf16 headline config")
    ap.add_argument("--budget-s", type=float, default=1200.0,
                    help="per-recipe wall-clock budget (subprocess)")
    ap.add_argument("--only", default="",
                    help="label substring filter; with an existing --out "
                         "file, matching rows are re-measured in place and "
                         "the others kept (repair mode)")
    args = ap.parse_args()

    doc = {"rows": [], "protocol":
           "bench.py reps/median(best-within-5%)/p50/p99; fresh subprocess "
           "per recipe; regimes: prompt_ids=0 byte-fallback, 60 realistic"}
    if args.only and Path(args.out).exists():
        doc = json.loads(Path(args.out).read_text())

    def upsert(row):
        for i, r in enumerate(doc["rows"]):
            if r.get("label") == row["label"]:
                doc["rows"][i] = row
                break
        else:
            doc["rows"].append(row)
        Path(args.out).write_text(json.dumps(doc, indent=1))  # incremental

    head_label = "paligemma_3b_bf16_headline"
    if args.headline and (not args.only or args.only in head_label):
        log("[families] headline (paligemma 3b bf16)")
        row = run_one({"VLM_TPU_BENCH_REGIMES": "0,60"}, args.budget_s)
        row["label"] = head_label
        row["recipe"] = "headline: 3B bf16, 128 slots, bf16 KV"
        upsert(row)
        log(f"[families] headline: {row.get('value', row.get('error'))}")
    for v in VARIANTS:
        if args.only and args.only not in v["label"]:
            continue
        log(f"[families] {v['label']}")
        row = run_one(v["env"], args.budget_s)
        row["label"] = v["label"]
        row["recipe"] = v["recipe"]
        upsert(row)
        log(f"[families] {v['label']}: "
            f"{row.get('value', row.get('error'))}")
    Path(args.out).write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
