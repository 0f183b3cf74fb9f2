#!/usr/bin/env bash
# Development launcher (counterpart of reference start.sh).
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"

CONFIG="${1:-config/config.yaml}"
if [[ ! -f "$CONFIG" ]]; then
    echo "no config at $CONFIG — copy config/config.yaml.example and edit it"
    exit 1
fi
exec python3 main.py --config "$CONFIG"
