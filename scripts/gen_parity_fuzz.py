#!/usr/bin/env python3
"""Seed-logged parity FUZZ corpus: a fresh adversarial postfix log per
run, mutated line-by-line, with expectations from actually running
/root/reference's PostfixLogParser (parse.py:380-423 feed_line path) —
so ParityFuzzSpec checks our parser against the reference's behavior on
input neither has ever seen, not a pinned replay.

Base sessions come from gen_parity_log (interleaved sessions, queue-id
reuse, both subject encodings, dovecot, missing fields, noise). On top,
seeded mutations exercise the guard/fault paths:

  - timestamp corruption (bad month/second, missing tz, space-T, junk)
  - mid-line truncation (guard clauses, short-token arity)
  - line duplication and deletion (state overwrite / missing-field holes)
  - orphan lines (status/removed for never-opened queue ids)
  - deferred/bounced statuses with varied enhanced codes and parens
  - k=v edge lines (empty values, orig_to, conn_use, trailing commas)
  - UTF-8 garbage noise lines

Writes OUTDIR/mail.log, OUTDIR/expected_events.jsonl,
OUTDIR/expected_counts.txt ("<n_events> <n_faults>").

Usage: python3 scripts/gen_parity_fuzz.py OUTDIR [n_sessions] [seed]
"""
import json, os, random, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_parity_log  # noqa: E402
from gen_parity_resources import run_reference, event_row  # noqa: E402

BAD_TS = [
    "2023-13-45T99:99:99+03:00",   # out-of-range fields
    "2023-11-14T22:13:09",         # missing tz offset
    "2023-11-14 22:13:09+03:00",   # space instead of T
    "2023-11-14T22:13:09.123456789+03:00",  # nanosecond precision
    "2023-11-14T22:13:09Z",        # zulu suffix
    "not-a-timestamp",
    "2023-02-30T10:00:00+03:00",   # impossible day
    "23-11-14T22:13:09+03:00",     # two-digit year
]

STATUS_LINES = [
    "to=<x@fuzz.ex>, relay=none, delay=42, delays=41/0.2/0.3/0.1, dsn=4.4.1, "
    "status=deferred (connect to mx.fuzz.ex[10.0.0.1]:25: Connection refused)",
    "to=<y@fuzz.ex>, relay=mx[2.3.4.5]:25, dsn=5.1.1, status=bounced "
    "(host said: 550 5.1.1 unknown user (in reply to RCPT TO command))",
    "to=<z@fuzz.ex>, orig_to=<orig@fuzz.ex>, relay=local, dsn=2.0.0, "
    "status=sent (delivered to maildir)",
    "to=<w@fuzz.ex>, conn_use=2, relay=mx2, delay=0.5, dsn=2.6.0, "
    "status=sent (250 2.6.0 queued)",
    "to=<empty@fuzz.ex>, relay=, dsn=, status=sent ()",
    "to=<v@fuzz.ex>, status=sent",  # no paren description at all
]

GARBAGE = [
    "¯\\_(ツ)_/¯ totally not a log line",
    "{\"json\": \"in the syslog\", \"n\": 3}",
    "\t  \t",
    "postfix/smtpd",  # too few tokens
    "2023-11-14T22:13:09+03:00",  # timestamp alone
]


def mutate(lines, rnd):
    out = []
    qids = [f"FFF{i:08X}" for i in range(40)]  # never-opened queue ids
    for line in lines:
        r = rnd.random()
        if r < 0.01:
            continue  # delete — punches holes in sessions
        if r < 0.03:
            cut = rnd.randrange(1, max(2, len(line)))
            out.append(line[:cut])  # truncate mid-line
            continue
        if r < 0.05:
            parts = line.split(" ", 1)
            if len(parts) == 2:
                out.append(f"{rnd.choice(BAD_TS)} {parts[1]}")
                continue
        out.append(line)
        if r > 0.98:
            out.append(line)  # duplicate — state overwrite paths
        if 0.05 <= r < 0.07:
            ts = line.split(" ", 1)[0]
            q = rnd.choice(qids)
            orphan = rnd.choice([
                f"{ts} h postfix/qmgr[5]: {q}: removed",
                f"{ts} h postfix/lmtp[4]: {q}: {rnd.choice(STATUS_LINES)}",
                f"{ts} h postfix/cleanup[2]: {q}: message-id=<orphan@fuzz.ex>",
            ])
            out.append(orphan)
        if 0.07 <= r < 0.08:
            ts = line.split(" ", 1)[0]
            out.append(f"{ts} h {rnd.choice(GARBAGE)}")
    # a few sessions with richer status variety, internally ordered
    t0 = "2023-11-14T23:{m:02d}:{s:02d}+03:00"
    for i in range(30):
        q = f"EEE{i:08X}"
        m, s = divmod(i * 7, 60)
        ts = lambda k: t0.format(m=m, s=(s + k) % 60)  # noqa: E731
        out.append(f"{ts(0)} h postfix/smtpd[1]: {q}: client=fz{i}[9.9.9.{i}]")
        out.append(f"{ts(1)} h postfix/qmgr[3]: {q}: from=<f{i}@fuzz.ex>, size={i}, nrcpt=2 (queue active)")
        out.append(f"{ts(2)} h postfix/lmtp[4]: {q}: {rnd.choice(STATUS_LINES)}")
        out.append(f"{ts(3)} h postfix/smtp[6]: {q}: {rnd.choice(STATUS_LINES)}")
        if rnd.random() < 0.8:
            out.append(f"{ts(4)} h postfix/qmgr[5]: {q}: removed")
    return out


def main(out_dir, n_sessions=800, seed=1):
    rnd = random.Random(seed)
    base_log = os.path.join(out_dir, "_base.log")
    os.makedirs(out_dir, exist_ok=True)
    gen_parity_log.main(base_log, n_sessions, seed)
    lines = mutate(open(base_log).read().splitlines(), rnd)
    os.remove(base_log)

    p = run_reference(lines)
    with open(os.path.join(out_dir, "mail.log"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(out_dir, "expected_events.jsonl"), "w") as f:
        for e in p.events:
            f.write(json.dumps(event_row(e), sort_keys=True) + "\n")
    with open(os.path.join(out_dir, "expected_counts.txt"), "w") as f:
        f.write(f"{len(p.events)} {len(p.faults)}\n")
    print(f"seed={seed} lines={len(lines)} events={len(p.events)} "
          f"faults={len(p.faults)}")


if __name__ == "__main__":
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 else 800,
         int(sys.argv[3]) if len(sys.argv) > 3 else 1)
