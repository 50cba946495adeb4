#!/usr/bin/env python3
"""Adversarial postfix log generator for parity checks: interleaved
sessions, queue-id reuse, both subject encodings, dovecot sieve lines,
missing required fields, truncated guards, noise. Lines sorted by time so
each session stays internally ordered."""
import base64, random, sys
from datetime import datetime, timedelta, timezone

def main(out, n_sessions=3000, seed=7, n_files=1):
    rnd = random.Random(seed)
    lines = []  # (sort_time, line)
    t = 1700000000.0
    for i in range(n_sessions):
        qid = "%011X" % (i - 4 if (rnd.randrange(4) == 0 and i > 4) else i)
        t += rnd.random() * 2
        base = t
        def iso(off):
            dt = datetime.fromtimestamp(base + off, tz=timezone(timedelta(hours=3)))
            return dt.isoformat()
        msgid = f"<m{i}@ex.com>"
        lines.append((base, f"{iso(0)} h postfix/smtpd[1]: {qid}: client=c{i}[1.2.3.{i%250}]"))
        if rnd.randrange(10) != 0:
            lines.append((base+0.1, f"{iso(0.1)} h postfix/cleanup[2]: {qid}: message-id={msgid}"))
        if rnd.randrange(10) != 0:
            lines.append((base+0.2, f"{iso(0.2)} h postfix/qmgr[3]: {qid}: from=<u{i}@d{i%5}.ex>, size={100+i}, nrcpt=1 (queue active)"))
        for j in range(1 + rnd.randrange(3)):
            lines.append((base+0.3+j*0.01, f"{iso(0.3+j*0.01)} h postfix/lmtp[4]: {qid}: to=<r{j}@d{j%2}.ex>, relay=rl{j}, delay=0.{j}, dsn=2.0.0, status=sent (250 2.0.{j} <r{j}@d{j%2}.ex> ok)"))
        k = rnd.randrange(4)
        if k == 0:
            b64 = base64.b64encode(f"Тема {i}".encode()).decode()
            lines.append((base+0.4, f"{iso(0.4)} h postfix/cleanup[2]: {qid}: warning: header Subject: =?UTF-8?B?{b64}?= from x.ex[1.1.1.1]; from=<a@b> to=<c@d>"))
        elif k == 1:
            lines.append((base+0.4, f"{iso(0.4)} h postfix/cleanup[2]: {qid}: warning: header Subject: plain subject {i} from local; from=<a@b> to=<c@d>"))
        elif k == 2:
            lines.append((base+0.4, f"{iso(0.4)} h postfix/cleanup[2]: {qid}: warning: header Subject:"))
        if rnd.randrange(3) == 0:
            lines.append((base+0.45, f"Apr 30 15:09:27 lmtp(x)<1><Y>: Info: sieve: msgid={msgid}: fileinto action: stored into 'Box{i}'"))
        if rnd.randrange(4) == 0:
            lines.append((base+0.25, f"{iso(0.25)} h lmtp(x)[9]: {qid}: Info: sieve: msgid={msgid}: fileinto action: stored into 'Combo{i}' message-id=<chg{i}@ex.com>"))
        if rnd.randrange(5) == 0:
            lines.append((base+0.05, f"{iso(0.05)} h postfix/smtpd[1]: disconnect from c{i}[1.2.3.{i%250}] ehlo=1 quit=1"))
        lines.append((base+0.5, f"{iso(0.5)} h postfix/qmgr[5]: {qid}: removed"))
    lines.sort(key=lambda p: p[0])
    if n_files <= 1:
        with open(out, "w") as f:
            for _, l in lines:
                f.write(l + "\n")
    else:
        # split the globally time-sorted stream into consecutive chunks
        # with ascending mtimes: the streaming CLI's file source then
        # replays them in arrival order, and maxFilesPerTrigger can
        # bound micro-batch size for throughput-ladder probes
        import os
        os.makedirs(out, exist_ok=True)
        per = (len(lines) + n_files - 1) // n_files
        now = int(__import__("time").time())
        for k in range(n_files):
            p = os.path.join(out, "part-%04d.log" % k)
            with open(p, "w") as f:
                for _, l in lines[k * per:(k + 1) * per]:
                    f.write(l + "\n")
            os.utime(p, (now + k, now + k))
    print(f"wrote {len(lines)} lines to {out}")

if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3000,
         n_files=int(sys.argv[3]) if len(sys.argv) > 3 else 1)
