#!/usr/bin/env bash
# End-to-end smoke of the REAL CLI path: graft.Main running as its own
# JVM process (exactly what spark-submit would exec), against the
# committed configs/flagship.yaml and the driver-generated testdata.
#
# Proves, process-level: YAML parse + var substitution (value/env/sql/CLI
# kinds), three source kinds, the check engine, file + pipe sinks, the
# DATA_VALIDATOR_STATUS line, and the exit-code contract
# (PASS -> 0; FAIL -> 0 without / nonzero with --exitErrorOnFail).
#
# Usage: scripts/flagship_smoke.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.001}
FIXDIR="target/fixtures/$(echo "$SF" | sed 's/[^A-Za-z0-9.]/_/g')"
OUT=$(mktemp -d /tmp/graft_flagship.XXXXXX)

echo "== build + fixtures (orc/csv derived once from parquet testdata) =="
sbt -batch compile > /dev/null
sbt -batch "runMain graft.MakeFixtures $SF" > /dev/null
test -d "$FIXDIR/nation.orc" || { echo "missing fixture $FIXDIR/nation.orc"; exit 1; }

# Spark 4 on JDK 17 outside spark-submit needs the module opens the
# launcher would otherwise inject (same list as build.sbt).
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"

run_cli() {
  # shellcheck disable=SC2086
  SPARK_GRAFT_MASTER="local[8]" java $ADD_OPENS -Xmx4g \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Main "$@"
}

fail() { echo "SMOKE FAILED: $1"; exit 1; }

echo "== PASS scenario =="
set +e
run_cli --config configs/flagship.yaml \
  --vars "sf=$SF,fixdir=$FIXDIR,out=$OUT,minKey=0" \
  --jsonReport "$OUT/cli_report.json" > "$OUT/stdout_pass.txt" 2> "$OUT/stderr_pass.txt"
rc=$?
set -e
grep -q '^DATA_VALIDATOR_STATUS=PASS$' "$OUT/stdout_pass.txt" \
  || { cat "$OUT/stderr_pass.txt"; fail "no PASS status line"; }
[ "$rc" -eq 0 ] || fail "PASS run exited $rc, expected 0"

# the same report must reach every sink: config file sink, pipe sink,
# --jsonReport (file sinks append a trailing newline; the pipe carries
# the exact bytes — compare the content)
cmp -s <(sed -e '$a\' "$OUT/report.json") <(sed -e '$a\' "$OUT/piped.json") \
  || fail "pipe sink differs from file sink"
cmp -s "$OUT/report.json" "$OUT/cli_report.json" || fail "--jsonReport differs from file sink"

# golden content: status, all three tables, every check label, resolved vars
for needle in \
  '"status":"PASS"' \
  'customer.parquet' 'nation.orc' '"format:csv"' \
  '"rowcount"' '"nullcheck_c_name"' '"regex_c_name"' '"rangecheck_c_nationkey"' \
  '"colmax_n_nationkey"' '"unique_n_nationkey"' '"negcheck_p_retailprice"' \
  '"maxNation":"24"' '"minKey":"0"' '"nameRegex":"^Customer#"' '"home":' \
  '"varSubDict"' '"buildInfo"' ; do
  grep -qF -- "$needle" "$OUT/report.json" || fail "report missing $needle"
done
echo "PASS scenario OK"

echo "== FAIL scenario (condition empties the scan; --exitErrorOnFail) =="
set +e
run_cli --config configs/flagship.yaml \
  --vars "sf=$SF,fixdir=$FIXDIR,out=$OUT,minKey=999999999" \
  --exitErrorOnFail > "$OUT/stdout_fail.txt" 2> "$OUT/stderr_fail.txt"
rc=$?
set -e
grep -q '^DATA_VALIDATOR_STATUS=FAIL$' "$OUT/stdout_fail.txt" \
  || { cat "$OUT/stderr_fail.txt"; fail "no FAIL status line"; }
[ "$rc" -ne 0 ] || fail "FAIL run with --exitErrorOnFail exited 0"
grep -qF '"status":"FAIL"' "$OUT/report.json" || fail "report not FAIL"
grep -qF '"label":"rowcount","failed":true' "$OUT/report.json" \
  || fail "rowcount check did not fail"
echo "FAIL scenario OK"

echo "== FAIL-without-flag scenario (status FAIL but exit 0) =="
set +e
run_cli --config configs/flagship.yaml \
  --vars "sf=$SF,fixdir=$FIXDIR,out=$OUT,minKey=999999999" \
  > "$OUT/stdout_fail2.txt" 2> /dev/null
rc=$?
set -e
grep -q '^DATA_VALIDATOR_STATUS=FAIL$' "$OUT/stdout_fail2.txt" || fail "no FAIL status line (no-flag)"
[ "$rc" -eq 0 ] || fail "FAIL run without --exitErrorOnFail exited $rc, expected 0"
echo "FAIL-without-flag scenario OK"

echo "FLAGSHIP SMOKE OK (artifacts in $OUT)"
