"""Record a full-suite pytest run as a machine-checkable round artifact.

The suite is the repo's load-bearing quality gate (SURVEY.md §4: the
reference has no tests; the rebuild's pyramid replaces them), so each
round snapshot carries the actual result, not an asserted count:

    python -m pytest tests/ -q --junit-xml=/tmp/tests.xml
    python tools/record_tests.py /tmp/tests.xml TESTS_r04.json

Merges multiple xml files (the real-TPU export test runs serialized
after the CPU suite to keep the chip uncontended):

    python tools/record_tests.py a.xml b.xml TESTS_r04.json
"""

from __future__ import annotations

import json
import platform
import sys
import xml.etree.ElementTree as ET


def summarize(xml_paths: list[str]) -> dict:
    total = failures = errors = skipped = 0
    time_s = 0.0
    failed_tests: list[str] = []
    slowest: list[tuple[float, str]] = []
    for path in xml_paths:
        root = ET.parse(path).getroot()
        suites = root.iter("testsuite")
        for s in suites:
            total += int(s.get("tests", 0))
            failures += int(s.get("failures", 0))
            errors += int(s.get("errors", 0))
            skipped += int(s.get("skipped", 0))
            time_s += float(s.get("time", 0.0))
        for case in root.iter("testcase"):
            name = f"{case.get('classname')}::{case.get('name')}"
            slowest.append((float(case.get("time", 0.0)), name))
            if case.find("failure") is not None \
                    or case.find("error") is not None:
                failed_tests.append(name)
    slowest.sort(reverse=True)
    return {
        "total": total,
        "passed": total - failures - errors - skipped,
        "failed": failures + errors,
        "skipped": skipped,
        "green": failures + errors == 0,
        "duration_s": round(time_s, 1),
        "failed_tests": failed_tests,
        "slowest": [{"test": n, "s": round(t, 1)} for t, n in slowest[:5]],
        "environment": {
            "platform": platform.platform(),
            "python": platform.python_version(),
            "note": "CPU 8-device virtual mesh (tests/conftest.py); "
                    "real-TPU export test merged from its own run",
        },
    }


if __name__ == "__main__":
    *xmls, out = sys.argv[1:]
    rec = summarize(xmls)
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({k: rec[k] for k in
                      ("total", "passed", "failed", "skipped", "green",
                       "duration_s")}))
