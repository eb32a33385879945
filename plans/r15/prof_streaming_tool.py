"""Profile the streaming catalog entries: wall time + per-batch progress
breakdown (durationMs) captured via StreamingQueryListener, prep warmed
like bench.py. Usage: python /tmp/prof_streaming.py [--no-prep] [names...]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql.streaming import StreamingQueryListener


class Prog(StreamingQueryListener):
    def __init__(self):
        self.events = []

    def onQueryStarted(self, event):
        self.events.append(("started", time.perf_counter(), None))

    def onQueryProgress(self, event):
        p = event.progress
        self.events.append(("progress", time.perf_counter(), {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": dict(p.durationMs),
            "stateOperators": [
                {"operatorName": getattr(s, "operatorName", "?"),
                 "commitTimeMs": getattr(s, "commitTimeMs", None),
                 "numRowsTotal": getattr(s, "numRowsTotal", None)}
                for s in (p.stateOperators or [])
            ],
        }))

    def onQueryTerminated(self, event):
        self.events.append(("terminated", time.perf_counter(), None))

    def onQueryIdle(self, event):
        self.events.append(("idle", time.perf_counter(), None))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    no_prep = "--no-prep" in sys.argv
    passes = 2

    from arcane_framework_spark.operators.cache import cache_scope
    from arcane_framework_spark.queries import QUERIES
    from arcane_framework_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prof-streaming", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    warm_df = spark.range(0, 256, 1, int(cpus))
    warm_df.mapInPandas(lambda it: it, warm_df.schema).write.format(
        "noop").mode("overwrite").save()

    if not no_prep:
        from arcane_framework_spark.prep import warm_shared_prep_itemized
        pb = warm_shared_prep_itemized(spark, sf_dir)
        print(f"prep {round(sum(pb.values()), 1)}s", flush=True)

    listener = Prog()
    spark.streams.addListener(listener)

    names = args or sorted(n for n in QUERIES if n.startswith("streaming_"))
    out = {}
    for name in names:
        recs = []
        for _ in range(passes):
            listener.events.clear()
            t0 = time.perf_counter()
            with cache_scope():
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            wall = time.perf_counter() - t0
            # reconstruct: time from entry start to stream start; per-batch
            ev = list(listener.events)
            started = [t for k, t, _ in ev if k == "started"]
            term = [t for k, t, _ in ev if k == "terminated"]
            progress = [d for k, _, d in ev if k == "progress"]
            rec = {
                "wall": round(wall, 3),
                "pre_stream": round(started[0] - t0, 3) if started else None,
                "drain": round(term[-1] - started[0], 3)
                if started and term else None,
                "post_stream": round(t0 + wall - term[-1], 3)
                if term else None,
                "n_batches": len(progress),
                "batches": progress,
            }
            recs.append(rec)
        out[name] = recs
        best = min(recs, key=lambda r: r["wall"])
        print(f"{name:42s} wall={best['wall']:6.2f} pre={best['pre_stream']}"
              f" drain={best['drain']} post={best['post_stream']}"
              f" nb={best['n_batches']}", flush=True)

    with open("/tmp/prof_streaming.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
