"""Inspect trace event args to map device ops back to model source."""
import glob
import gzip
import json

files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as f:
    data = json.load(f)
events = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = [e for e in events if e.get("ph") == "X"
       and "TPU" in pid_names.get(e.get("pid"), "")]
# show the args of the biggest few events
dev.sort(key=lambda e: -e.get("dur", 0))
seen = set()
for e in dev[:200]:
    name = e["name"]
    if name in seen:
        continue
    seen.add(name)
    if len(seen) > 25:
        break
    print(f"{e['dur']/1e3:8.3f} ms {name}")
    for k, v in (e.get("args") or {}).items():
        print(f"      {k}: {str(v)[:160]}")
