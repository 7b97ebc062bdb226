"""Summarize /tmp/tpu_session_r3.log: step exit codes + measurement
lines, skipping compile noise.

    python experiments/summarize_r3_log.py [path]
"""
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r3.log"
step = None
for line in open(path, errors="replace"):
    m = re.match(r"=== (.*) \(", line)
    if m:
        step = m.group(1)
        print(f"\n## {step}")
        continue
    m = re.match(r"--- exit (\d+)", line)
    if m:
        code = m.group(1)
        if code != "0":
            print(f"   !! exit {code}")
        continue
    if re.search(r"\d+\.\d+ ms|PASS|FAIL|Mrays|vs_baseline|OK|entries", line):
        print("  ", line.rstrip())
