#!/bin/bash
# Retry the long-L flash train rows after the bwd key-tile VMEM cap
# (ops/flash_attn.py _bwd_tiles): the original r4_session_queue 2c row
# died in Mosaic scoped-vmem at 512x2048 bwd tiles.  Chained behind the
# session queue so the single relay chip is never contended.
set -u
cd /root/repo

# guard against a missing/empty/stale pidfile: falling through the wait
# would contend with the session queue on the single relay chip — the
# exact condition this chaining exists to prevent
PIDFILE=/tmp/r4_session_queue.pid
until [ -s "$PIDFILE" ]; do
  echo "[flashretry] waiting for $PIDFILE"
  sleep 60
done
QPID=$(cat "$PIDFILE")
case "$QPID" in
  ''|*[!0-9]*) echo "[flashretry] bad pid '$QPID'; aborting"; exit 1 ;;
esac
while kill -0 "$QPID" 2>/dev/null; do
  sleep 120
done
echo "[flashretry] queue exited $(date -u +%H:%M:%S)"

echo "[flashretry] flash L=3072 (bwd tiles capped)"
timeout 3600 python experiments/mfu.py 128 32 3 3072 1 mix bf16 flash remat \
  > /tmp/mfu_flash_l3072.json 2>/tmp/mfu_flash_l3072.log \
  || echo "[flashretry] L=3072 flash failed again (see log)"

echo "[flashretry] flash L=4096 stretch"
timeout 3600 python experiments/mfu.py 128 32 3 4096 1 mix bf16 flash remat \
  > /tmp/mfu_flash_l4096.json 2>/tmp/mfu_flash_l4096.log \
  || echo "[flashretry] L=4096 flash failed (see log)"
timeout 3600 python experiments/mfu.py 128 32 3 4096 1 mix bf16 remat \
  > /tmp/mfu_l4096.json 2>/tmp/mfu_l4096.log \
  || echo "[flashretry] L=4096 jnp failed (see log)"

echo "[flashretry] done $(date -u +%H:%M:%S)"
