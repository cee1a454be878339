#!/bin/sh
# PROXY power source for tools/power_tracer.py --power-cmd.
#
# This container exposes NO hardware power interface (no
# /sys/class/powercap RAPL, no hwmon, no ipmitool, and the TPU sits
# behind a network relay with no SMI analog — probed 2026-08-18).  This
# proxy maps host CPU utilization linearly onto a nominal power envelope
# (IDLE_W..TDP_W) so the tracer -> analyzer pipeline can be exercised
# end-to-end; the resulting watts are UNCALIBRATED and labeled as such
# in ENERGY.md.  On a host with a real meter, point --power-cmd at it
# instead (reference analog: powerTracer_NVIDIA.py:9-25 polls
# nvidia-smi).
IDLE_W=${IDLE_W:-10}
TDP_W=${TDP_W:-65}
read cpu u1 n1 s1 i1 w1 q1 sq1 st1 rest < /proc/stat
sleep 0.05
read cpu u2 n2 s2 i2 w2 q2 sq2 st2 rest < /proc/stat
busy=$(( (u2-u1)+(n2-n1)+(s2-s1)+(q2-q1)+(sq2-sq1)+(st2-st1) ))
idle=$(( (i2-i1)+(w2-w1) ))
total=$(( busy + idle ))
[ "$total" -gt 0 ] || total=1
awk -v b="$busy" -v t="$total" -v i="$IDLE_W" -v p="$TDP_W" \
    'BEGIN { printf "%.2f\n", i + (p - i) * b / t }'
