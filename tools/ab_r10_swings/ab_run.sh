#!/bin/bash
# Interleaved A/B re-bench: round-9 HEAD (89757c5) vs round-11 HEAD classes.
# 3 alternating invocations per side; BenchOne itself is warmup + min-of-2.
set -u
ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
QS="q174_wasserstein_shift q17_langid q105_regional_revenue q46_quant_error q34_splits q184_priority_wait q120_cross_source_dupes q203_lsh_quality_audit q145_epoch_allocation q129_vocab_growth q56_strat_sample q122_source_divergence"
mkdir -p /tmp/ab_out
for i in 1 2 3; do
  for side in A B; do
    if [ "$side" = A ]; then CP="/tmp/ab_r9/target/scala-2.13/classes:$JARS"; else CP="/tmp/ab_head_classes:$JARS"; fi
    echo "=== $side pass $i $(date +%T) ==="
    SPARK_GRAFT_CPUS=32 java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false -cp "$CP" graft.tools.BenchOne /root/testdata/sf0.1 $QS > /tmp/ab_out/${side}_$i.txt 2>/tmp/ab_out/${side}_$i.err
    echo "exit=$?"
  done
done
echo DONE
