#!/usr/bin/env bash
# Manage the systemd deployment (counterpart of reference service.sh).
set -euo pipefail

INSTALL_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
SERVICE=telescope_detection.service
WATCHDOG=stream_watchdog.service
PYTHON="${PYTHON:-$(command -v python3)}"

usage() {
    cat <<EOF
usage: $0 {install|uninstall|start|stop|restart|status|logs|health}

install    render the unit templates and enable both services
uninstall  stop + disable + remove the units
start/stop/restart/status   systemctl passthrough
logs       follow journald for the main service
health     curl the /health endpoint
EOF
}

render_units() {
    sed -e "s|__INSTALL_DIR__|$INSTALL_DIR|g" \
        -e "s|__PYTHON__|$PYTHON|g" \
        -e "s|__USER__|$(whoami)|g" \
        "$INSTALL_DIR/telescope_detection.service.template" \
        | sudo tee /etc/systemd/system/$SERVICE >/dev/null
    sed -e "s|__INSTALL_DIR__|$INSTALL_DIR|g" \
        "$INSTALL_DIR/stream_watchdog.service" \
        | sudo tee /etc/systemd/system/$WATCHDOG >/dev/null
    sudo systemctl daemon-reload
}

case "${1:-}" in
    install)
        render_units
        sudo systemctl enable --now $SERVICE $WATCHDOG
        echo "installed and started"
        ;;
    uninstall)
        sudo systemctl disable --now $SERVICE $WATCHDOG || true
        sudo rm -f /etc/systemd/system/$SERVICE /etc/systemd/system/$WATCHDOG
        sudo systemctl daemon-reload
        ;;
    start|stop|restart|status)
        sudo systemctl "$1" $SERVICE
        ;;
    logs)
        sudo journalctl -u $SERVICE -f
        ;;
    health)
        "$PYTHON" "$INSTALL_DIR/check_status.py"
        ;;
    *)
        usage; exit 1 ;;
esac
