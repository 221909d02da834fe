#!/usr/bin/env bash
# Sample every bundled dataset with one trained architecture.
#
# Rebuild of /root/reference/utils/bash/run_gen_samples_all_ds.sh:1-54 — the
# reference loops `generate_samples.py` over dataset configs; this drives the
# crowdmod CLI the same way.  Each dataset needs a checkpoint saved under its
# config's SAVE_DIR first (see tools/ddim_sweep.py for the metric sweeps).
#
# Usage: tools/sample_all_datasets.sh [ARCH] [PLOT_TYPE]
set -euo pipefail
cd "$(dirname "$0")/.."

ARCH="${1:-DDPM-UNet}"
PLOT_TYPE="${2:-Static}"

DATASETS=(ATC HERMES-BO HERMES-BN HERMES-CR-90 HERMES-CR-90-OBST HERMES-CR-120 HERMES-CR-120-OBST ETHUCY)

for ds in "${DATASETS[@]}"; do
    cfg="configs/${ds}.yml"
    if [[ ! -f "$cfg" ]]; then
        echo "skipping ${ds}: ${cfg} not found"
        continue
    fi
    list="configs/${ds}_datafiles.yml"
    list_args=()
    [[ -f "$list" ]] && list_args=(--configList-yml-file "$list")
    echo "=== sampling ${ds} with ${ARCH} ==="
    python -m crowdmod_tpu.cli.generate_samples \
        --config-yml-file "$cfg" "${list_args[@]}" \
        --arch "$ARCH" --plot-type "$PLOT_TYPE" \
        || echo "WARN: ${ds} failed (missing checkpoint or data?)"
done
