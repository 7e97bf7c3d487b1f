#!/bin/bash
# Stand up a LOCAL PostgreSQL (no docker needed) for the gated
# integration suite, using the distro's server binaries. Postgres
# refuses to run as root, so when invoked as root the cluster runs
# under a dedicated `graftpg` user (created if missing).
#
#   tools/run_local_pg.sh start   # initdb (once) + start on :54329
#   tools/run_local_pg.sh stop
#
# then:
#   GRAFT_IT_PG=1 GRAFT_IT_PG_PORT=54329 \
#     sbt "testOnly graft.PostgresIntegrationSpec"
#
# The local install has only the built-in pgoutput plugin; the wal2json
# tests detect that and cancel (docker-compose.yml's image ships
# wal2json for environments where a daemon is available).
set -euo pipefail

PGBIN="${PGBIN:-/usr/local/bin}"
DATA="${GRAFT_PG_DATA:-/tmp/graft_pgdata}"
SOCK="${GRAFT_PG_SOCK:-/tmp/graft_pgsock}"
PORT="${GRAFT_IT_PG_PORT:-54329}"
LOG="${GRAFT_PG_LOG:-/tmp/graft_pg.log}"

run_as_pg() {
  if [ "$(id -u)" = "0" ]; then
    id graftpg >/dev/null 2>&1 || useradd -m graftpg
    runuser -u graftpg -- "$@"
  else
    "$@"
  fi
}

case "${1:-start}" in
  start)
    # create the run user BEFORE any chown references it: on a fresh
    # machine the first chown otherwise fails ("invalid user") and
    # set -e aborts the whole start
    if [ "$(id -u)" = "0" ]; then
      id graftpg >/dev/null 2>&1 || useradd -m graftpg
    fi
    if [ ! -f "$DATA/PG_VERSION" ]; then
      mkdir -p "$DATA" "$SOCK"
      [ "$(id -u)" = "0" ] && chown graftpg "$DATA" "$SOCK" 2>/dev/null || true
      PWFILE=$(mktemp)
      echo postgres > "$PWFILE"
      [ "$(id -u)" = "0" ] && chown graftpg "$PWFILE"
      run_as_pg "$PGBIN/initdb" -D "$DATA" -U postgres \
        --auth=scram-sha-256 --pwfile="$PWFILE" -E UTF8 >/dev/null
      rm -f "$PWFILE"
      cat >> "$DATA/postgresql.conf" <<EOF
wal_level = logical
max_replication_slots = 8
max_wal_senders = 8
max_prepared_transactions = 10
listen_addresses = '127.0.0.1'
port = $PORT
unix_socket_directories = '$SOCK'
EOF
    fi
    # older data dirs predate the two-phase test: PREPARE TRANSACTION
    # needs max_prepared_transactions > 0 (a restart-only GUC, default 0)
    if ! grep -q '^max_prepared_transactions' "$DATA/postgresql.conf"; then
      echo "max_prepared_transactions = 10" >> "$DATA/postgresql.conf"
    fi
    run_as_pg "$PGBIN/pg_ctl" -D "$DATA" -l "$LOG" -w start
    echo "postgres up on 127.0.0.1:$PORT (user postgres / postgres, wal_level=logical)"
    ;;
  stop)
    run_as_pg "$PGBIN/pg_ctl" -D "$DATA" -m fast -w stop
    ;;
  *)
    echo "usage: $0 start|stop" >&2; exit 2
    ;;
esac
