#!/bin/bash
# Dev loop: compile, run graft.Verify at $1 (default sf0.01), selfcheck.
# Bypasses `sbt run` startup by invoking java directly.
set -e
cd /root/repo
SF_DIR=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
shift 2 2>/dev/null || shift $#
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUT"
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT" "$@" 2>/tmp/verify.log || { tail -30 /tmp/verify.log; exit 1; }
grep -E "\[verify\]" /tmp/verify.log || true
python3 tools/selfcheck.py "$SF_DIR" "$OUT" "$@"
