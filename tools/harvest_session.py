"""Summarize a chip-session output dir (/tmp/r2sNN) for the perf log.

/tmp is wiped on container restarts, so queue results must be moved into
the repo (docs/PERF_PLAN.md / ROADMAP.md) promptly. This prints one
compact block per arm: the queue rc, any bench JSON line, window lines,
PSNR/ttq lines from the validators, and PASS/FAIL lines from the bisect
ladder.

Usage: python tools/harvest_session.py /tmp/r2s16 [/tmp/r2s18 ...]
"""

import json
import os
import re
import sys

KEY = re.compile(
    r"(^\{\"metric\")|(^# window)|(PASS|FAIL|HANG|DIED)|"
    r"(psnr|PSNR)|(^ttq)|(M rows/s)|(samples/s)|( ms )|(rc=)|(FAILED)")


def main():
    for out in sys.argv[1:]:
        qlog = os.path.join(out, "queue.log")
        print(f"==== {out}")
        if os.path.exists(qlog):
            for ln in open(qlog):
                print("  " + ln.rstrip())
        for name in sorted(os.listdir(out)):
            if not name.endswith(".log") or name == "queue.log":
                continue
            path = os.path.join(out, name)
            lines = open(path, errors="replace").read().splitlines()
            hits = [ln for ln in lines if KEY.search(ln)]
            print(f"-- {name} ({len(lines)} lines)")
            for ln in hits[-25:]:
                print("   " + ln)
        # validator JSON outputs
        for root, _, files in os.walk(out):
            for f in files:
                if f.endswith(".json"):
                    p = os.path.join(root, f)
                    try:
                        d = json.load(open(p))
                        print(f"-- {os.path.relpath(p, out)}: "
                              f"{json.dumps(d)[:400]}")
                    except Exception:
                        pass


if __name__ == "__main__":
    main()
