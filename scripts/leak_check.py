#!/usr/bin/env python3
"""Repo hygiene scan: greps the tracked sources for markers that must
never appear in this public-knowledge-only codebase (private package
imports, non-public URLs, cloud bucket URIs, chat links, credential
shapes, unexplained environment variables) and writes LEAKCHECK.json.

Provenance (why this exists in-repo): earlier rounds' LEAKCHECK.json
only changed its round number between runs, so a stale re-stamp was
indistinguishable from a fresh scan. This script adds `generated_utc`
and `input_sha256` (a digest over every scanned file's path+bytes) —
identical inputs give an identical digest, so a re-stamp is now visible
and a fresh scan over changed sources provably re-read them.

Usage: python3 scripts/leak_check.py [round_number]
"""
import hashlib, json, re, subprocess, sys, time

CATEGORIES = {
    # import of anything outside the public stack (spark/scala/java/
    # scalatest/scalacheck/hadoop/jackson + this repo's own package)
    # reverse-domain imports (com./net./io./ai./dev./corp-style roots)
    # outside the public stack; plain lowercase roots (graft, scala,
    # java, local values like `spark.implicits`) can't name a private
    # artifact and are not flagged
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|dev|corp|internal)\."
        r"(?!fasterxml\.|github\.)[\w.]+"),
    # URLs that are not the public ecosystem (apache/github/scala-lang/
    # w3/ietf/wikipedia/arxiv/example hosts used in docs and tests)
    "internal-url": re.compile(
        r"https?://(?!(?:[\w.-]*\.)?(?:apache\.org|github\.com|githubusercontent\.com|"
        r"scala-lang\.org|scala-sbt\.org|w3\.org|ietf\.org|wikipedia\.org|arxiv\.org|"
        r"duckdb\.org|python\.org|example\.(?:com|org|net)|localhost|127\.0\.0\.1))"
        r"[\w.-]+"),
    "internal-pkg2": re.compile(r"\b(?:claude|anthropic)[\w-]*\b", re.I),
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w.-]+"),
    "slack-link": re.compile(r"\b[\w-]*\.slack\.com\b|\bslack://"),
    "api-key": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{36})\b"),
    "axon-env": re.compile(r"\bsys\.env[^\n]*(?<!SPARK_GRAFT_)(?:SECRET|TOKEN|CRED)"),
}

SCAN_EXT = (".scala", ".sbt", ".py", ".md", ".json", ".sh")

# The judge reports (VERDICT.md / ADVICE.md) discuss this scanner and
# quote its marker names when doing so. The old suppression keyed on the
# quote's *shape* (two marker names adjacent), which also matches real
# dotted model-ID references and skipped the whole line for ALL
# categories (an s3:// URI sharing the line escaped). A line is exempt
# only when BOTH hold: (1) it explicitly names a scanner artifact or
# category — evidence it is ABOUT the scan — AND (2) the flagged token
# itself sits inside backticks (a quoted pattern, not prose reference);
# and even then only the marker-name category (internal-pkg2) is
# suppressed — bucket URIs, keys, URLs etc. on the same line still fail
# the gate. A marker token outside backticks is flagged even on a
# scanner-discussion line, and any line NOT discussing the scanner is
# never suppressed.
SCANNER_REF = re.compile(
    r"leak_check|LEAKCHECK|PATTERN_QUOTE|SCANNER_REF|"
    r"internal-(?:import|url|pkg2|bucket)|slack-link|api-key|axon-env")
BACKTICK_SPAN = re.compile(r"`[^`]*`")


def all_inside_backticks(line, rx):
    """True iff every rx match in line falls inside a `...` span."""
    spans = [m.span() for m in BACKTICK_SPAN.finditer(line)]
    return all(
        any(s <= m.start() and m.end() <= e for s, e in spans)
        for m in rx.finditer(line))


def main(round_no):
    files = sorted(
        f for f in subprocess.run(
            ["git", "ls-files"], capture_output=True, text=True,
            check=True).stdout.splitlines()
        if f.endswith(SCAN_EXT) and not f.startswith("LEAKCHECK"))
    digest = hashlib.sha256()
    hits = {k: [] for k in CATEGORIES}
    for f in files:
        data = open(f, "rb").read()
        digest.update(f.encode() + b"\0" + data + b"\0")
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError:
            continue
        # the scanner's own pattern definitions would match themselves —
        # it is hashed into input_sha256 above but not line-scanned.
        if f == "scripts/leak_check.py":
            continue
        # the judge-authored round reports (VERDICT.md / ADVICE.md) ARE
        # line-scanned; see SCANNER_REF above for the narrow exemption.
        report = f in ("VERDICT.md", "ADVICE.md")
        scala = f.endswith((".scala", ".sbt"))
        for i, line in enumerate(text.splitlines(), 1):
            scanner_line = report and SCANNER_REF.search(line)
            for cat, rx in CATEGORIES.items():
                if (cat == "internal-pkg2" and scanner_line
                        and all_inside_backticks(line, rx)):
                    continue
                # judge-report lines naming the repo's own committed
                # CLAUDE.md instructions file (a file of THIS repo, not
                # an internal reference): exempt only when every match
                # on the line is that literal filename, only in the
                # report files, only for the marker-name category.
                if (cat == "internal-pkg2" and report
                        and all(m.group(0).lower() == "claude"
                                and line[m.end():m.end() + 3] == ".md"
                                # word boundary after ".md": don't let
                                # "claude.mdx" etc. ride the exemption
                                and (len(line) == m.end() + 3
                                     or not line[m.end() + 3].isalnum())
                                for m in rx.finditer(line))):
                    continue
                # the import whitelist describes the JVM stack — python
                # (driver-side tooling) imports its own stdlib freely
                if cat == "internal-import" and not scala:
                    continue
                if rx.search(line):
                    hits[cat].append(f"{f}:{i}: {line.strip()[:160]}")
    out = {
        "round": round_no,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "input_sha256": digest.hexdigest(),
        "n_files_scanned": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open("LEAKCHECK.json", "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"scanned {len(files)} files, {out['n_hits']} hits, "
          f"input_sha256={out['input_sha256'][:16]}…")
    sys.exit(1 if out["n_hits"] else 0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
