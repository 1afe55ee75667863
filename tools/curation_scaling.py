"""Scaling measurement for the END-TO-END curation pipeline (jobs/
curation_pipeline.run_curation) at two core counts — the composition
number, not any single operator. Run each level in its OWN process
(python tools/curation_scaling.py <cores> [n_docs]); bracket with
tools/cpu_calibrate.py; best-of-2 inside (the chain is slow)."""
import json, sys, time
sys.path.insert(0, ".")
from jobs.curation_pipeline import run_curation, synthesize_webtext
from medacy_spark.session import get_spark
cores, n = int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
spark = get_spark(app_name=f"curation_scaling_{cores}", cores=cores)
docs = synthesize_webtext(spark, n).localCheckpoint()
def run():
    run_curation(spark, docs, seq_len=2048)["packed"].count()
run_curation(spark, synthesize_webtext(spark, 5000), seq_len=2048)["packed"].count()  # warm-up
best = float("inf")
for _ in range(2):
    t0 = time.monotonic(); run(); best = min(best, time.monotonic() - t0)
print(json.dumps({"cores": cores, "n_docs": n, "wall_sec": round(best, 2),
                  "docs_per_sec": round(n / best)}))
spark.stop()
