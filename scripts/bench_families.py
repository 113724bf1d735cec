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
    try:
        out = subprocess.run(
            [sys.executable, str(REPO_ROOT / "bench.py")],
            env=env, capture_output=True, text=True, timeout=budget_s + 180)
        line = out.stdout.strip().splitlines()[-1]
        row = json.loads(line)
    except Exception as e:  # noqa: BLE001 — degrade row-by-row
        stderr = getattr(e, "stderr", None) or ""
        if isinstance(stderr, bytes):
            stderr = stderr.decode("utf-8", "replace")
        tail = stderr.strip().splitlines()[-1][:300] if stderr.strip() else ""
        row = {"error": f"{type(e).__name__}: {e}"[:300],
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
    args = ap.parse_args()

    doc = {"rows": [], "protocol":
           "bench.py reps/median(best-within-5%)/p50/p99; fresh subprocess "
           "per recipe; regimes: prompt_ids=0 byte-fallback, 60 realistic"}
    if args.headline:
        log("[families] headline (paligemma 3b bf16)")
        row = run_one({"VLM_TPU_BENCH_REGIMES": "0,60"}, args.budget_s)
        row["label"] = "paligemma_3b_bf16_headline"
        row["recipe"] = "headline: 3B bf16, 128 slots, bf16 KV"
        doc["rows"].append(row)
        log(f"[families] headline: {row.get('value', row.get('error'))}")
    for v in VARIANTS:
        log(f"[families] {v['label']}")
        row = run_one(v["env"], args.budget_s)
        row["label"] = v["label"]
        row["recipe"] = v["recipe"]
        doc["rows"].append(row)
        log(f"[families] {v['label']}: "
            f"{row.get('value', row.get('error'))}")
        Path(args.out).write_text(json.dumps(doc, indent=1))  # incremental
    Path(args.out).write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
