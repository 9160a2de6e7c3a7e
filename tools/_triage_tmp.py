import os, sys
sys.path.insert(0, "/root/repo")
from hadron_spark import get_spark
from hadron_spark.queries import QUERIES
spark = get_spark("triage")
sf = "/root/testdata/sf0.001"

def indent(line):
    # depth = position of operator name after tree-drawing chars
    i = 0
    for ch in line:
        if ch in " :+-|": i += 1
        else: break
    return i

for name in sys.argv[1:]:
    df = QUERIES[name](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    print("="*90)
    print(name)
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln or "BroadcastNestedLoopJoin" in ln:
            d = indent(ln)
            print("  FLAG:", ln.strip()[:150])
            # print subtree children up to 4 lines deeper-first levels
            shown = 0
            for j in range(i+1, len(lines)):
                dj = indent(lines[j])
                if dj <= d: break
                if dj <= d + 6 and shown < 6:
                    print("      |", lines[j].strip()[:160])
                    shown += 1
            print()
spark.stop()
