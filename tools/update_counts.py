#!/usr/bin/env python3
"""Splice the ACTUAL test count from an `sbt test` log into README.md.

The README's suite count was hand-typed and has been one round stale three
rounds running (632 vs 638 in round 14). Mechanical fix: run

    sbt -batch test | tee /tmp/sbt_test.log
    python3 tools/update_counts.py /tmp/sbt_test.log

The script reads ScalaTest's summary line ("Tests: succeeded N, failed F,
..."), refuses to splice anything from a failing run, writes the one-line
TEST_COUNTS.txt artifact, and rewrites the README line tagged with
`<!-- test-count -->`.
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main(log_path: str) -> int:
    log = pathlib.Path(log_path).read_text(errors="replace")
    m = re.search(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+)", log)
    if not m:
        print("no ScalaTest summary line found in", log_path)
        return 1
    succeeded, failed, canceled = map(int, m.groups())
    if failed:
        print(f"refusing to splice counts from a failing run ({failed} failed)")
        return 1
    counts = ROOT / "TEST_COUNTS.txt"
    counts.write_text(
        f"succeeded={succeeded} failed={failed} canceled={canceled}\n")

    readme = ROOT / "README.md"
    text = readme.read_text()
    new_line = (f"sbt test                                           "
                f"# {succeeded} differential + plan + property tests "
                f"<!-- test-count -->")
    text2, n = re.subn(r"sbt test\s+#.*<!-- test-count -->", new_line, text)
    if n != 1:
        print(f"expected exactly one '<!-- test-count -->' marker, found {n}")
        return 1
    readme.write_text(text2)
    print(f"spliced: {succeeded} tests ({canceled} canceled) -> README.md, "
          f"TEST_COUNTS.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sbt_test.log"))
