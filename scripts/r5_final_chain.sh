#!/bin/bash
# Round-5 final evaluation stage: waits for the 1000-query IR A/B, runs the
# BEIR-format benchmark (VERDICT r4 task #4) with the better encoder, and
# assembles IRBENCH_r05.json.  Encoder packaging stays a manual step.
set -u
cd /root/repo

while [ ! -f /tmp/r5_irbench_done ]; do sleep 30; done

python - > /tmp/r5_pick_winner.log 2>&1 <<'EOF'
import json
base = json.load(open("data/irbench_r5_base/results.json"))
large = json.load(open("data/irbench_r5_large/results.json"))
def mv(res):
    return next(v["mrr_at_10"] for v in res["variants"] if v["variant"] == "sem-multivector")
winner = base["embedder"] if mv(base) >= mv(large) else large["embedder"]
open("/tmp/r5_winner.txt", "w").write(winner)
print("base mv MRR:", mv(base), "large mv MRR:", mv(large), "winner:", winner)
EOF

WINNER=$(cat /tmp/r5_winner.txt)
python scripts/beir_run.py --docs 2122 --queries 1000 \
  --embedder "$WINNER" \
  --dir data/beir_heldout --store-dir data/beir_stores \
  > /tmp/r5_beir.log 2>&1

python - > /tmp/r5_assemble.log 2>&1 <<'EOF'
import json, pathlib
repo = pathlib.Path("/root/repo")
out = {
    "round": 5,
    "protocol": {
        "corpus": "held-out inverse-cloze (data/corpus/heldout.jsonl), 2122 docs",
        "queries": 1000, "adapter_train_queries": 1000,
        "metrics": "doc-level MRR@10 / nDCG@10 / recall@10",
        "note": "widened from r4's 200 queries (VERDICT r4 weak #5); "
                "zero-egress image, so the BEIR-format run uses the same "
                "held-out corpus exported to standard BEIR layout",
    },
    "base_64m_maxsim": json.load(open(repo / "data/irbench_r5_base/results.json")),
    "large_168m": json.load(open(repo / "data/irbench_r5_large/results.json")),
}
beir = repo / "data/beir_heldout/results_AP_at_10.json"
if beir.exists():
    out["beir_format_run"] = {
        "harness": "scripts/beir_run.py -> irbench.run_ir_benchmark "
                   "(BEIR directory loader, TREC-run cache, AP@10)",
        "embedder": open("/tmp/r5_winner.txt").read(),
        "AP@10": json.load(open(beir)),
    }
(repo / "IRBENCH_r05.json").write_text(json.dumps(out, indent=1))
print("assembled IRBENCH_r05.json")
EOF

echo done > /tmp/r5_final_done
