#!/usr/bin/env python3
"""Direct parity check against the REFERENCE parser: feed the same log to
/root/reference's PostfixLogParser and to graft's ParseLogs output, compare
every event field-for-field.

Usage:
  sbt "runMain graft.tools.ParseLogs <log> <outDir>"
  python3 scripts/reference_parity.py <log> <outDir>
"""
import datetime, json, sys
import duckdb

EPOCH = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
MICRO = datetime.timedelta(microseconds=1)

sys.path.insert(0, "/root/reference/lognormalizer")
from parse import PostfixLogParser  # noqa: E402

COLS = ["ts_us", "queue_id", "domain_from", "domains_to", "message_from",
        "message_to", "message_id", "message_subject", "status", "status_code",
        "status_postfix_code", "status_description", "client", "orig_to",
        "dovecot_fileinto_action", "delay", "delays", "dsn", "nrcpt",
        "relay", "size", "raw_log"]


class P(PostfixLogParser):
    def __init__(self):
        super().__init__()
        self.events, self.faults = [], []

    def on_event(self, e):
        self.events.append(e)

    def on_fault(self, s, ex):
        self.faults.append(s)


def main(log, out_dir):
    p = P()
    for line in open(log):
        p.feed_line(line.rstrip("\n"))
    ref = []
    for e in p.events:
        ref.append({
            "ts_us": (e.timestamp - EPOCH) // MICRO,
            "queue_id": e.queue_id, "domain_from": e.domain_from,
            "domains_to": e.domains_to, "message_from": e.message_from,
            "message_to": e.message_to, "message_id": e.message_id,
            "message_subject": e.message_subject, "status": e.status,
            "status_code": getattr(e, "status_code", None),
            "status_postfix_code": getattr(e, "status_postfix_code", None),
            "status_description": e.status_description, "client": e.client,
            "orig_to": e.orig_to,
            "dovecot_fileinto_action": e.dovecot_fileinto_action,
            "delay": e.delay, "delays": e.delays, "dsn": e.dsn,
            "nrcpt": e.nrcpt, "relay": e.relay, "size": e.size,
            "raw_log": e.raw_log})

    con = duckdb.connect()
    got = con.execute(f"""
        select epoch_us(timestamp) ts_us, {", ".join(COLS[1:])}
        from '{out_dir}/events/*.parquet'""").fetchall()
    n_faults = con.execute(
        f"select count(*) from '{out_dir}/faults/*.parquet'").fetchone()[0]

    def norm(r):
        return tuple(tuple(v) if isinstance(v, list) else v for v in r)

    refset = sorted(norm([e[c] for c in COLS]) for e in ref)
    gotset = sorted(norm(list(r)) for r in got)
    print(f"reference events={len(refset)} faults={len(p.faults)} | "
          f"graft events={len(gotset)} faults={n_faults}")
    ok = refset == gotset and len(p.faults) == n_faults
    print("IDENTICAL FIELD-FOR-FIELD:", ok)
    if not ok:
        for a, b in zip(refset, gotset):
            if a != b:
                for c, x, y in zip(COLS, a, b):
                    if x != y:
                        print(f"  {c} | ref: {x!r} | graft: {y!r}")
                break
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
