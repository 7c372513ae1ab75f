#!/usr/bin/env bash
# Paired A/B probe runner (r15 measurement protocol, r14 verdict
# directive #4): alternate BEFORE/AFTER class trees B A B A in one shell
# session, running graft.ABProbe on the same query subset each time.
# Paired per-query ratios between adjacent runs cancel run-level host
# drift that single before/after runs cannot (±30% documented band).
#
# Usage: ab_probe.sh <before_classes> <after_classes> <deps_cp_file> \
#                    <sfDir> <passes> <reps> <query> [query ...]
# <deps_cp_file> holds the dependency classpath (sbt 'export
# Runtime/fullClasspath' output, minus the project classes dir).
set -u
BEFORE=$1; AFTER=$2; DEPS_FILE=$3; SF=$4; PASSES=$5; REPS=$6; shift 6
DEPS=$(cat "$DEPS_FILE")
for i in $(seq 1 "$REPS"); do
  for side in BEFORE AFTER; do
    CLS=$([ "$side" = BEFORE ] && echo "$BEFORE" || echo "$AFTER")
    echo "=== rep $i side $side ==="
    java -Xmx8g --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      -Dspark.driver.memory=8g \
      -cp "$CLS:$DEPS" graft.ABProbe "$SF" "$PASSES" "$@" 2>/dev/null \
      | grep '"metric":"abprobe"'
  done
done
