#!/usr/bin/env python3
"""Extract simple-literal assertFunction cases from the reference's
scalar-function tests into a replayable TSV.

Reads `assertFunction("<expr>", <TYPE>, <expected>);` lines from a fixed
list of reference test files and keeps only the cases whose expected
value is a SIMPLE literal (string / number / boolean / null) and whose
expression carries no \\uXXXX escapes (the TSV is UTF-8 text; exotic
codepoint round-trips are the reference's own unicode tests, not
dialect-conformance signal). Each kept case becomes one TSV row:

    <source file>\t<b64 expr>\t<java type expr>\t<kind>\t<b64 expected>\t<zone>

kind ∈ {null, bool, num, str}. Expressions and expectations are
base64-encoded so tabs/quotes/newlines can't corrupt the framing. zone
is the session time zone the reference harness ran the file under
(empty = UTC, the replay default).

The frozen output lives at src/test/resources/reference_assertions.tsv
and is replayed by ReferenceReplaySpec (sentinels always; the full
sweep under SPARK_GRAFT_REPLAY=1). Regenerate only to pick up MORE
coverage; the suite's pass-floor assumes the frozen snapshot.
"""
import base64
import re
import sys

REF = "/root/reference/presto-main/src/test/java/com/facebook/presto/"
FILES = [
    "operator/scalar/TestStringFunctions.java",
    "operator/scalar/TestMathFunctions.java",
    "operator/scalar/TestBitwiseFunctions.java",
    "operator/scalar/TestUrlFunctions.java",
    "operator/scalar/TestJsonFunctions.java",
    "operator/scalar/TestConditions.java",
    "operator/scalar/TestArrayIntersectFunction.java",
    "operator/scalar/TestArraySortFunction.java",
    "type/TestArrayOperators.java",
    "type/TestMapOperators.java",
    "operator/scalar/TestArrayFunctions.java",
    "operator/scalar/TestLambdaExpression.java",
    "operator/scalar/TestMapFilterFunction.java",
    "operator/scalar/TestMapTransformKeyFunction.java",
    "operator/scalar/TestMapTransformValueFunction.java",
    "operator/scalar/TestTypeOfFunction.java",
    "operator/scalar/TestWordStemFunction.java",
    "type/TestBigintOperators.java",
    "type/TestBooleanOperators.java",
    "type/TestIntegerOperators.java",
    "type/TestSmallintOperators.java",
    "type/TestTinyintOperators.java",
    "type/TestDoubleOperators.java",
    "type/TestRealOperators.java",
    "type/TestDecimalOperators.java",
    "type/TestCharOperators.java",
    "type/TestRowOperators.java",
    # round-16 extension: the next tranche of simple-literal corpora —
    # JSON cast operators, decimal→integral casts (the HALF_UP family),
    # regexp, the array HOF quartet, varchar/varbinary operators, IP
    # prefix functions, uuid ordering, truncate-with-precision. The
    # session-zone-dependent families (datetime base, TSWTZ/TIME bases,
    # intervals) stay out — their expecteds encode the harness zone.
    "type/TestJsonOperators.java",
    "type/TestDecimalCasts.java",
    "type/TestVarcharOperators.java",
    "operator/scalar/AbstractTestRegexpFunctions.java",
    "operator/scalar/TestVarbinaryFunctions.java",
    "operator/scalar/TestArrayTransformFunction.java",
    "operator/scalar/TestArrayFilterFunction.java",
    "operator/scalar/TestArrayMatchFunctions.java",
    "operator/scalar/TestArrayNormalizeFunction.java",
    "operator/scalar/TestTruncateWithPrecision.java",
    "operator/scalar/TestIpPrefixFunctions.java",
    "type/TestUuidOperators.java",
    # round-16 second tranche: the remaining zone-independent operator
    # corpora with simple-literal yield. The interval files harvest only
    # their comparison/boolean rows (the rendering expecteds are
    # SqlInterval* constructor calls, which self-exclude); the datetime/
    # timestamp bases stay out — their simple-literal rows still encode
    # the reference harness's session zone.
    "operator/scalar/TestArrayCombinationsFunction.java",
    "operator/scalar/TestArrayExceptFunction.java",
    "operator/scalar/TestArrayReduceFunction.java",
    "operator/scalar/TestQuantileDigestFunctions.java",
    "operator/scalar/TestTDigestFunctions.java",
    # TestTryFunction.java stays out: every simple-literal row there is
    # the reference-internal '"$internal$try"(() -> …)' harness helper
    # (the compiler's lowered TRY form), not the TRY surface itself —
    # TRY conformance is covered by TestConditions + the e01/f06/n07
    # corpus entries
    "type/TestCharacterStringCasts.java",
    "type/TestIpAddressOperators.java",
    "type/TestIpPrefixOperators.java",
    "type/TestUnknownOperators.java",
    "type/TestIntervalDayTime.java",
    "type/TestIntervalYearMonth.java",
    # round-16 third tranche: the datetime corpora. These files are NOT
    # zone-independent — the reference harness pins a session zone per
    # file (TestingSession.DEFAULT_TIME_ZONE_KEY = Pacific/Apia, or an
    # explicit Europe/Berlin), so ZONES below carries the pin into the
    # TSV and the replay sets spark.sql.session.timeZone to match.
    # Rows reading the fixed session START TIME (now/current_*/local*)
    # are screened out — the replay has no query-start injection.
    "operator/scalar/TestDateTimeFunctionsBase.java",
    "type/TestTimestampBase.java",
    "type/TestTimeBase.java",
    "type/TestDateBase.java",
    "type/TestDateTimeOperatorsBase.java",
]

# session zone the reference harness runs the file under ('' = the
# replay default, UTC)
ZONES = {
    "operator/scalar/TestDateTimeFunctionsBase.java": "Pacific/Apia",
    "type/TestTimestampBase.java": "Pacific/Apia",
    "type/TestTimeBase.java": "Pacific/Apia",
    "type/TestDateBase.java": "Europe/Berlin",
    "type/TestDateTimeOperatorsBase.java": "Europe/Berlin",
}

# expressions bound to the harness's fixed session start time cannot
# replay (Engine has no query-start injection)
START_TIME_BOUND = re.compile(
    r"(?i)\b(now|current_date|current_time|current_timestamp|"
    r"localtime|localtimestamp)\b")

PAT = re.compile(
    r'assertFunction\("((?:[^"\\]|\\.)*)",\s*([A-Za-z_().,0-9 ]+),\s*(.+?)\);\s*$')


def simple(e: str) -> bool:
    e = e.strip()
    if e in ("null", "true", "false"):
        return True
    if re.fullmatch(r"-?\d+\.?\d*[LE]?\d*", e):
        return True
    if re.fullmatch(r'"(?:[^"\\]|\\.)*"', e):
        return True
    return False


def unesc(s: str) -> str:
    return s.encode().decode("unicode_escape")


def main(out_path: str) -> None:
    n = 0
    with open(out_path, "w") as out:
        for f in FILES:
            src = open(REF + f).read()
            zone = ZONES.get(f, "")
            for line in src.splitlines():
                m = PAT.search(line.strip())
                if not m or not simple(m.group(3)) or "\\u" in m.group(1):
                    continue
                expr, typ, exp = m.group(1), m.group(2).strip(), m.group(3).strip()
                if zone and START_TIME_BOUND.search(expr):
                    continue
                if exp in ("null", "true", "false"):
                    kind, val = ("null" if exp == "null" else "bool"), exp
                elif exp.startswith('"'):
                    kind, val = "str", unesc(exp[1:-1])
                else:
                    kind, val = "num", exp

                def b(s: str) -> str:
                    return base64.b64encode(s.encode()).decode()

                out.write(
                    f"{f}\t{b(unesc(expr))}\t{typ}\t{kind}\t{b(val)}\t{zone}\n")
                n += 1
    print(f"wrote {n} cases to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "src/test/resources/reference_assertions.tsv")
