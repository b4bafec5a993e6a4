"""Deterministic ADVERSARIAL second corpus (r12 judge Next #8).

Every text operator in the registry was developed against the one
driver-generated synthetic corpus; constants like LEV_SIM_MIN, the
quality cutoffs, the lang-id n-gram table and the BPE merge ranks are
therefore *distribution-coupled* by construction. This tool builds a
SECOND corpus with deliberately different distributions — real-ish
URLs, heavy unicode (CJK, astral emoji, combining marks, RTL,
zero-width), exact/near-duplicate clusters, boilerplate templates,
PII-laced rows, extreme lengths (empty → ~16k chars) — and the full
oracle gate (tools/check_oracle.py) is run against it, so a
Spark-vs-DuckDB divergence that the tuned corpus can never expose
(regex unit mismatches, codepoint-vs-UTF-16 lengths, locale-sensitive
casing, hash-input drift on unusual bytes) fails loudly BEFORE a
driver round does.

Only the `documents` table is adversarial: that is where the tuned
constants live. Every other table is copied from the base scale
factor, so the corpus stays a drop-in sf_dir for the whole registry:

    python tools/second_corpus.py [out_dir] [base_sf_dir]
    python tools/check_oracle.py <out_dir>

Generation is seeded and pure-python (stable across runs/machines);
the corpus is scratch (gitignored) — THIS FILE is the artifact.
"""

from __future__ import annotations

import os
import random
import shutil
import sys

N_DOCS = 400
SEED = 20260816

_WORDS = (
    "stream batch merge window filter join table scan shuffle spill "
    "broadcast partition executor driver catalyst tungsten arrow codegen "
    "the a of to and in for with from analytics latency throughput"
).split()

_URLS = [
    "https://example.com/a/b?q=spark&lang=en",
    "http://xn--bcher-kva.example/ümlaut?x=1&y=2#frag",
    "https://sub.domain.example.org:8443/path/to/resource.html",
    "ftp://files.example.net/pub/data_2024-01-01.tar.gz",
    "https://example.com/search?q=caf%C3%A9+r%C3%A9sum%C3%A9",
]

_UNICODE = [
    "数据处理管道在大规模集群上运行",
    "ストリーム処理は一秒ごとに集計する",
    "données agrégées par seconde 🚀",
    "emoji stress 😀😃🤖👩‍💻🇺🇳 family 👨‍👩‍👧‍👦 done",
    "combining áéí marks and z̵a̵l̵go",
    "rtl שלום عالم mixed with ltr",
    "zero​width​joined​tokens",
    "astral plane 𝕬𝖓𝖆𝖑𝖞𝖙𝖎𝖈𝖘 𓀀𓀁𓀂 glyphs",
]

_PII = [
    "contact jane.doe+spam@example-mail.co.uk or (555) 867-5309 today",
    "ssn 123-45-6789 card 4111 1111 1111 1111 ip 192.168.001.255",
    "email ADMIN@EXAMPLE.COM phone +1-800-555-0100 ext. 42",
]

_BOILER = (
    "terms of service apply. all rights reserved. subscribe to our "
    "newsletter for updates. cookie policy: "
)


def _sentence(rnd: random.Random, n: int) -> str:
    return " ".join(rnd.choice(_WORDS) for _ in range(n))


def _doc_text(rnd: random.Random, i: int) -> str:
    k = i % 10
    if k == 0:  # plain prose with a URL mid-sentence
        return (
            f"{_sentence(rnd, 12)} see {rnd.choice(_URLS)} "
            f"{_sentence(rnd, 10)}"
        )
    if k == 1:  # unicode-heavy
        return " ".join(rnd.choice(_UNICODE) for _ in range(3))
    if k == 2:  # exact-duplicate cluster (same text for every k==2 doc
        # in a 40-doc stripe: rnd is NOT consulted → byte-identical)
        return _BOILER + "identical body shared by the whole cluster"
    if k == 3:  # near-duplicate: template + tiny positional edit
        return (
            f"{_BOILER}report number {i // 10} generated for tenant "
            f"alpha with status green and checksum ok"
        )
    if k == 4:  # PII-laced
        return f"{_sentence(rnd, 6)} {rnd.choice(_PII)} {_sentence(rnd, 6)}"
    if k == 5:  # very long (~8-16k chars): repetition-detector food
        unit = _sentence(rnd, 8) + ". "
        return unit * rnd.randint(60, 120)
    if k == 6:  # very short / degenerate-ish but non-null
        return rnd.choice(["x", "  ", "?!", ".", "a b", "\t", "0"])
    if k == 7:  # boilerplate header + unique tail (span-dedup food)
        return _BOILER * 3 + _sentence(rnd, 20) + f" uid{i}"
    if k == 8:  # numbers, punctuation, markup-ish noise
        return (
            f"<div id='x{i}'>{rnd.random():.12f} &amp; 1,234,567.89 -- "
            f"[{i}] {{json: true}} 100% $5.99 3/4</div>"
        )
    # k == 9: mixed casing + urls + unicode tail
    return (
        f"{_sentence(rnd, 8).upper()} Visit {rnd.choice(_URLS)} "
        f"{rnd.choice(_UNICODE)}"
    )


def generate(out_dir: str, base_dir: str = "/root/testdata/sf0.001") -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rnd = random.Random(SEED)
    langs = ["en", "es", "de", "zh", "fr", "ja"]
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(N_DOCS):
        text = _doc_text(rnd, i)
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(langs[i % len(langs)])
        rows["source"].append(f"adv{i % 7}")
        rows["n_chars"].append(len(text))
    os.makedirs(out_dir, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "source": pa.array(rows["source"], pa.string()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    for f in os.listdir(base_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            src = os.path.join(base_dir, f)
            dst = os.path.join(out_dir, f)
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copyfile(src, dst)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".secondcorpus",
    )
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    print(generate(out, base))
