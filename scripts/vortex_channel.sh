#!/usr/bin/env bash
# Vortex channel scene at full reference scale — the round-3 configuration
# that solves the scene the reference's own notebook concedes fails
# (reference workload: /root/reference/starterL.py rho=1000, impulsive
# inlet u=8, 400 basis sites x 10 slices; its vortex/vortex.ipynb: "can
# not process the nonlinear scene").
#
# Measured on one TPU chip (COMPARISON.md "Round 3: channel scene solved"):
# inlet rel err 2.97e-3, analytic divergence 5.7e-7, ~143 s/Picard
# iteration steady state (first iteration +compile ~317 s).
python starterL.py --preset channel \
    --picard_iters 3 \
    --output_path ./results/vortex_channel \
    --log_dir ./log/vortex_channel \
    "$@"
