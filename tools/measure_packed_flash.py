"""On-chip A/B: packed-layout flash (strided block DMAs, no standalone head
relayouts) vs the head-major default, at bench shapes. Run on the real TPU:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/measure_packed_flash.py
"""
import json
import os
import subprocess
import sys
import time


def run_arm(env_extra):
    env = {**os.environ, "LAM_SLIDE_BENCH_SWEEP": "8",
           "LAM_SLIDE_BENCH_NO_DOPRI5": "1", **env_extra}
    p = subprocess.run([sys.executable, "bench.py", "--worker"],
                       capture_output=True, text=True, timeout=1200, env=env)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": p.stderr.strip().splitlines()[-1:]}
    return json.loads(lines[-1])


def main():
    results = {}
    for name, env in (("packed", {}),
                      ("headmajor", {"LAM_SLIDE_NO_PACKED_FLASH": "1"}),
                      ("packed2", {}),
                      ("headmajor2", {"LAM_SLIDE_NO_PACKED_FLASH": "1"})):
        results[name] = run_arm(env)
        print(f"# {name}: {results[name].get('value')}", file=sys.stderr,
              flush=True)
    print(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
                      "tool": "measure_packed_flash.py",
                      "result": {k: v.get("value") for k, v in results.items()}}))


if __name__ == "__main__":
    main()
