#!/bin/bash
# One-shot TPU measurement runbook for the round-3 pending numbers
# (run when the axon tunnel is back: bench + train-step b32/b64 phases).
# Each step is bounded; first compiles may take minutes (cache persists at
# ~/.cache/mgdt_jax_cache). ONE TPU process at a time — run this alone.
set -x
cd /root/repo
timeout 1200 python bench.py
timeout 1800 python tools/profile_train_phases.py 32 640
timeout 2400 python tools/profile_train_phases.py 64 640
timeout 1800 python tools/train_throughput.py 32 640 20
