#!/usr/bin/env bash
# r19 anchor campaign, phase B. Order: short runs first (more likely to
# land wholly inside a good stretch), the two long sessions last.
#
# Stage 2 now carries IN-RUN CONTROLS: four plan-stable, non-mover
# queries (q03/q42/q44/q80 -- untouched since r15, spread across the
# suite's cost range) measured in the SAME OneQ session as the movers.
# With no mcpu/cpu <= 1.2 window existing on this host today (80-probe
# trail, floor 1.213), per-query cross-window comparison needs a
# same-window calibration: each mover's inflation vs its r15
# centiseconds is judged AGAINST the controls' inflation in the same
# run, not against an assumed-clean absolute.
set -u
cd /root/repo
CP="/tmp/graft_r19_classes:/opt/spark/jars/*"
export CLASSES=/tmp/graft_r19_classes THRESHOLD=${THRESHOLD:-1.28} POLL=30
log() { echo "[campaign $(date +%H:%M:%S)] $*" >&2; }

# stage 2': movers + controls, warm min-of-two, one bracketed session
BUDGET=2400 tools/anchor.sh env \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java -cp "$CP" -Xmx48g graft.OneQ \
  q132_hopping_trending q131_minhash_calibration q133_grouping_sets \
  q124_weighted_sample q62_temperature_mix \
  q120_audience_overlap q123_funnel q121_pagerank q125_communities \
  q03_extents q42_tfidf q44_extents_by_group q80_cut_spans \
  > /tmp/oneq_movers.out 2> /tmp/oneq_movers.err
log "stage2 movers rc=$?"
sleep 45

# stage 3: drift family on the UNCHANGED r16 100x dataset (warm
# local[4], the r16/r17/r18 inset protocol)
BUDGET=1800 tools/anchor.sh env \
  SPARK_GRAFT_SF_DIR=/tmp/scale100_r16 SPARK_GRAFT_CPUS=4 \
  java -cp "$CP" -Xmx16g graft.OneQ \
  q147_cm_frequency q148_token_js_shift q149_cm_js_shift \
  q150_js_movers q152_cm_frequency_xx q153_cm_calibration \
  > /tmp/drift100_anchor.out 2> /tmp/drift100_anchor.err
log "stage3 drift rc=$?"
sleep 45

# stage 4: multi-region pyramid session (full + incremental phases)
BUDGET=2400 tools/anchor.sh env \
  SPARK_GRAFT_CPUS=32 \
  java -cp "$CP" -Xmx64g graft.MultiRegion 1 /tmp/mr_r19 \
  > /tmp/mr_r19.out 2> /tmp/mr_r19.err
log "stage4 pyramid rc=$?"
sleep 45

# stage 1 retry: the full sf0.1 bench under the stationarity-gated
# deflator -- the first attempt launched into a collapsing window
# (brackets 1.77 -> 10.73/1.38); raw survived, deflated did not.
BUDGET=3600 tools/anchor.sh env \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java -cp "$CP" -Xmx48g graft.Bench \
  > /tmp/bench_anchor2.out 2> /tmp/bench_anchor2.err
log "stage1-retry bench rc=$?"
log "campaign done"
