"""Summarize a RUN_SLOW=1 pytest sweep into a committed receipt.

Reads the -q log (and junit xml if the run completed) and writes
docs/validation/runslow_sweep.json.  Usage:
    python tools/runslow_receipt.py LOG [XML] [--commit HASH] [--note TEXT]
"""
import json
import os
import re
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=", 1)[0][2:]: a.split("=", 1)[1]
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    log_path = args[0]
    xml_path = args[1] if len(args) > 1 else None

    log = open(log_path, errors="replace").read()
    rec = {
        "what": "full RUN_SLOW=1 pytest sweep (physics regressions + "
                "interpret-mode engine equivalence; SURVEY.md §4)",
        "log": os.path.basename(log_path),
        "snapshot_commit": opts.get("commit"),
        "note": opts.get("note"),
    }
    m = re.search(r"(\d+) passed(?:, (\d+) skipped)?"
                  r"(?:, (\d+) deselected)?(?:, (\d+) warnings?)?"
                  r" in ([\d:.]+)", log)
    fails = re.findall(r"FAILED ([^\s]+)", log)
    errors = re.findall(r"ERROR ([^\s]+)", log)
    if m:
        rec["passed"] = int(m.group(1))
        rec["skipped"] = int(m.group(2) or 0)
        rec["wall"] = m.group(5)
        rec["completed"] = True
    else:
        # incomplete run: count progress dots/markers (every -q progress
        # line is dots/s/F plus an optional [ NN%] tail)
        body = "".join(
            re.sub(r"[^.sxF]", "", ln)
            for ln in log.splitlines()
            if re.fullmatch(r"[.sxF]+(\s*\[\s*\d+%\])?\s*", ln)
        )
        rec["completed"] = False
        rec["progress_marks"] = {"passed_dots": body.count("."),
                                 "skipped": body.count("s"),
                                 "failed": body.count("F")}
        pct = re.findall(r"\[\s*(\d+)%\]", log)
        rec["last_percent_marker"] = int(pct[-1]) if pct else None
    rec["failed"] = fails
    rec["errored"] = errors
    if xml_path and os.path.exists(xml_path):
        import xml.etree.ElementTree as ET

        suite = ET.parse(xml_path).getroot().find("testsuite")
        if suite is not None:
            rec["junit"] = {k: suite.get(k) for k in
                            ("tests", "failures", "errors", "skipped",
                             "time")}
            slow = sorted(
                ((float(c.get("time", 0)), f"{c.get('classname')}."
                  f"{c.get('name')}") for c in suite.iter("testcase")),
                reverse=True)[:12]
            rec["slowest"] = [{"s": round(t, 1), "test": n}
                              for t, n in slow]
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "validation", "runslow_sweep.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec.get(k) for k in
                      ("completed", "passed", "skipped", "failed",
                       "progress_marks", "last_percent_marker")}))
    print("wrote", out)


if __name__ == "__main__":
    main()
