"""Regenerate tests/durations.json from a junit-xml test run.

The two-tier suite (tests/conftest.py) tiers tests by MEASURED call
time instead of hand-placed markers: anything above the threshold
(default 15 s, env GEN3C_FAST_THRESHOLD) is excluded from
``pytest -m fast``. This script refreshes the measurement file:

    python -m pytest tests/ -q --junit-xml=/tmp/junit.xml
    python scripts/update_test_durations.py /tmp/junit.xml

Only durations >= 1 s are recorded (keeps the file small; sub-second
tests are fast under any threshold).
"""

import json
import os
import sys
import xml.etree.ElementTree as ET

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    xml_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/junit.xml"
    out_path = os.path.join(_ROOT, "tests", "durations.json")
    tree = ET.parse(xml_path)
    durations = {}
    for case in tree.iter("testcase"):
        t = float(case.get("time", 0))
        if t < 1.0:
            continue
        classname = case.get("classname", "")  # tests.test_x[.Class]
        name = case.get("name", "")
        parts = classname.split(".")
        # rebuild the pytest nodeid: tests/test_x.py[::Class]::name
        if len(parts) >= 2 and parts[0] == "tests":
            fileid = f"{parts[0]}/{parts[1]}.py"
            cls = "::".join(parts[2:])
        else:
            fileid = classname.replace(".", "/") + ".py"
            cls = ""
        nodeid = f"{fileid}::{cls}::{name}" if cls else f"{fileid}::{name}"
        durations[nodeid] = round(t, 2)
    with open(out_path, "w") as f:
        json.dump(dict(sorted(durations.items())), f, indent=1)
        f.write("\n")
    over = sum(1 for v in durations.values() if v > 15)
    print(f"wrote {out_path}: {len(durations)} tests >=1s, {over} >15s")


if __name__ == "__main__":
    main()
