#!/usr/bin/env bash
# Paper experiment: 2D Taylor-Green vortex (reference scripts/fluid2Dtlgn.sh).
python main.py fluid \
    --tag fluid2d_tlgn \
    --init_cond taylorgreen \
    --num_hidden_layers 3 \
    --hidden_features 32 \
    -sr 128 \
    -vr 32 \
    --dt 0.05 \
    -T 100
