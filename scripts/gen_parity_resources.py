#!/usr/bin/env python3
"""Regenerate the reference-parity CI fixtures:

  src/test/resources/parity/mail.log.gz        adversarial postfix log
  src/test/resources/parity/expected_events.jsonl.gz
                                               the REFERENCE parser's events
  src/test/resources/parity/expected_counts.txt  "<n_events> <n_faults>"

The log comes from the same generator as the ad-hoc parity checks
(interleaved sessions, queue-id reuse, both subject encodings, dovecot,
missing fields, truncated guards, noise); the expectations come from
actually running /root/reference's PostfixLogParser, so
ReferenceParitySpec pins the reference's behavior — not our own replica.

Usage: python3 scripts/gen_parity_resources.py [n_sessions] [seed]
"""
import datetime, gzip, json, os, sys

EPOCH = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
MICRO = datetime.timedelta(microseconds=1)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
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


def run_reference(lines):
    """Feed lines through the reference's actual parser; return the
    collecting parser (events + faults)."""
    p = P()
    for line in lines:
        p.feed_line(line)
    return p


def event_row(e):
    """One reference event as the canonical JSON row the parity specs
    compare against."""
    # the reference keeps tz-naive timestamps naive
    # (datetime.fromisoformat, parse.py:398); our parser's documented
    # contract maps naive to UTC (LineParser "naive → UTC") — canonicalize
    # the reference's naive datetimes the same way for comparison
    ts = e.timestamp if e.timestamp.tzinfo is not None \
        else e.timestamp.replace(tzinfo=datetime.timezone.utc)
    return {
        "ts_us": (ts - EPOCH) // MICRO,
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
        "raw_log": e.raw_log}


def gen_lines(n_sessions, seed):
    import gen_parity_log
    out = "/tmp/_parity_ci.log"
    gen_parity_log.main(out, n_sessions, seed)
    return open(out).read().splitlines()


def main(n_sessions=1500, seed=11):
    lines = gen_lines(n_sessions, seed)
    p = run_reference(lines)

    res_dir = "src/test/resources/parity"
    os.makedirs(res_dir, exist_ok=True)
    with gzip.open(f"{res_dir}/mail.log.gz", "wt") as f:
        for l in lines:
            f.write(l + "\n")
    with gzip.open(f"{res_dir}/expected_events.jsonl.gz", "wt") as f:
        for e in p.events:
            f.write(json.dumps(event_row(e), sort_keys=True) + "\n")
    with open(f"{res_dir}/expected_counts.txt", "w") as f:
        f.write(f"{len(p.events)} {len(p.faults)}\n")
    print(f"lines={len(lines)} events={len(p.events)} faults={len(p.faults)}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500,
         int(sys.argv[2]) if len(sys.argv) > 2 else 11)
