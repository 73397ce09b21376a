"""Validate and merge new lexicon entries into text/data/lexicon.tsv.

Usage: python tools/merge_lexicon.py new_entries.tsv [more.tsv ...]

Checks each candidate line (word<TAB>PH PH ...):
  - word is lowercase a-z (apostrophes allowed), not already in the lexicon;
  - every phoneme is in the stressless-ARPAbet inventory (symbols.PHONEMES);
  - no duplicate words within the candidate files themselves.
Valid entries are appended to lexicon.tsv sorted into place; a summary is printed.
Invalid lines are reported and skipped (nonzero exit if any were invalid).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gonova_tts_tpu.text.symbols import PHONEMES  # noqa: E402

LEX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gonova_tts_tpu",
    "text",
    "data",
    "lexicon.tsv",
)
_WORD_RE = re.compile(r"^[a-z][a-z']*$")


def main() -> int:
    inventory = set(PHONEMES)
    header: list[str] = []
    existing: dict[str, str] = {}
    for line in open(LEX, encoding="utf-8"):
        if line.startswith("#"):
            header.append(line)
            continue
        if not line.strip():
            continue
        w, p = line.rstrip("\n").split("\t", 1)
        existing[w] = p

    bad = 0
    added = 0
    dup = 0
    for path in sys.argv[1:]:
        for ln, line in enumerate(open(path, encoding="utf-8"), 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 2:
                parts = line.split(None, 1)  # tolerate space-separated authoring
            if len(parts) != 2:
                print(f"BAD {path}:{ln}: not 2 fields: {line!r}")
                bad += 1
                continue
            w, p = parts[0].strip(), " ".join(parts[1].split())
            if not _WORD_RE.match(w):
                print(f"BAD {path}:{ln}: bad word {w!r}")
                bad += 1
                continue
            phs = p.split()
            unknown = [x for x in phs if x not in inventory]
            if unknown or not phs:
                print(f"BAD {path}:{ln}: unknown phonemes {unknown} in {w!r}")
                bad += 1
                continue
            if w in existing:
                dup += 1
                continue
            existing[w] = p
            added += 1

    with open(LEX, "w", encoding="utf-8") as f:
        f.writelines(header)
        for w in sorted(existing):
            f.write(f"{w}\t{existing[w]}\n")
    print(f"added={added} duplicates_skipped={dup} invalid={bad} total={len(existing)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
