"""BPE trainer production-depth smoke (VERDICT r10 #4): run the
incremental merge loop at the regime the ~14x claim extrapolates to —
a ~1M-distinct-word Zipf histogram (the MAX_BPE_VOCAB_COLLECT cap,
i.e. the largest histogram learn_bpe will ever hand the loop) and a
30k-merge production vocabulary. Reports wall time and peak driver
RSS; the numbers land in SCALE.md round 11.

The histogram is synthetic but SHAPED like a real one: Zipf-ranked
counts, shared stems so early merges have fat supports (the expensive
case — a head pair can touch 100k+ words), long tail of rare words.
Pure driver-side (the loop is the driver stage of learn_bpe; the one
corpus pass that builds the histogram is Spark's and already measured
elsewhere).

Usage: python scripts/bpe_depth_smoke.py [n_words] [n_merges] [--ids]

``--ids`` runs the CEILING-FREE id-space loop (operators/bpe_ids.py)
instead of the string loop — with a wide synthetic alphabet so the
pair supply sustains merge counts PAST the string path's 137,465
placeholder ceiling; reports the max allocated merge id to prove the
chain actually left the Unicode code-point space.
"""

from __future__ import annotations

import random
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_relieffc_fselection_spark.operators.bpe import _merge_loop


def synth_histogram(n_words: int, seed: int = 41) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    stems = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 5)))
        for _ in range(2000)
    ]
    hist: dict[str, int] = {}
    # Zipf-ish counts: rank r gets ~N/r; stems recur so pair supports
    # are fat at the head like a natural-language histogram
    r = 0
    while len(hist) < n_words:
        r += 1
        w = rng.choice(stems) + "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 7))
        )
        if w in hist:
            continue
        hist[w] = max(1, n_words // r)
    return sorted(hist.items())


def synth_histogram_wide(n_words: int, seed: int = 43) -> list[tuple[str, int]]:
    """Wide-alphabet variant (400 base symbols, longer words): enough
    pair diversity to sustain >137k merges — the regime the id-space
    loop exists for."""
    rng = random.Random(seed)
    alphabet = [chr(0x4E00 + i) for i in range(400)]  # CJK block, sub-U+E000
    stems = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 5)))
        for _ in range(4000)
    ]
    hist: dict[str, int] = {}
    r = 0
    while len(hist) < n_words:
        r += 1
        w = rng.choice(stems) + "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 9))
        )
        if w in hist:
            continue
        hist[w] = max(1, n_words // r)
    return sorted(hist.items())


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    ids_mode = "--ids" in sys.argv

    t0 = time.time()
    words = (synth_histogram_wide if ids_mode else synth_histogram)(n_words)
    t_synth = time.time() - t0
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    total_chars = sum(len(w) for w, _ in words)
    print(
        f"histogram: {len(words)} words, {total_chars} chars, "
        f"built in {t_synth:.1f}s, rss {rss_before:.0f} MB"
    )

    t0 = time.time()
    if ids_mode:
        from spark_relieffc_fselection_spark.operators.bpe_ids import (
            _merge_loop_ids,
        )

        id_words = [(tuple(ord(c) for c in w), wc) for w, wc in words]
        merges_i = _merge_loop_ids(id_words, n_merges)
        wall = time.time() - t0
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        max_id = max(m for m, _ in merges_i) if merges_i else 0
        print(
            f"_merge_loop_ids: {len(merges_i)} merges in {wall:.1f}s "
            f"({wall / max(len(merges_i), 1) * 1000:.2f} ms/merge), "
            f"peak rss {rss_after:.0f} MB "
            f"(+{rss_after - rss_before:.0f} over histogram); "
            f"max merge id 0x{max_id:X} "
            f"({'PAST' if max_id > 0x10FFFF else 'within'} the Unicode "
            "code-point space)"
        )
        # serving half: rank-based encode of the FULL histogram under
        # the trained chain — the claim under test is chain-length
        # INDEPENDENCE (one ranks-dict lookup per adjacent pair, never
        # a per-merge pass)
        from spark_relieffc_fselection_spark.operators.bpe_ids import (
            encode_word_ids,
        )

        ranks = {pair: (m, nid) for m, (nid, pair) in enumerate(merges_i, 1)}
        t0 = time.time()
        n_toks = 0
        for w, _wc in id_words:
            n_toks += len(encode_word_ids(list(w), ranks))
        enc_wall = time.time() - t0
        print(
            f"encode: {len(id_words)} words -> {n_toks} tokens in "
            f"{enc_wall:.1f}s ({len(id_words) / enc_wall:.0f} words/s "
            f"single-threaded) under the {len(merges_i)}-merge chain"
        )
        return
    merges = _merge_loop(words, n_merges)
    wall = time.time() - t0
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(
        f"_merge_loop: {len(merges)} merges in {wall:.1f}s "
        f"({wall / max(len(merges), 1) * 1000:.2f} ms/merge), "
        f"peak rss {rss_after:.0f} MB (+{rss_after - rss_before:.0f} over histogram)"
    )




def bridge_main() -> None:
    """--bridge (VERDICT r11 #4): train the STRING loop at production
    depth, convert the chain with merge_ranks_from_string_chain, and
    serve the full histogram through the id path's rank encoder —
    the measured evidence that a string-trained tokenizer gets
    chain-length-independent serving without retraining. Includes a
    sampled stacked-replace parity check (the full replace chain is
    O(chain) per word — exactly the plan the bridge retires — so the
    check samples; the exhaustive parity law is property-tested at
    100 merges in tests/test_textstats.py)."""
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000

    words = synth_histogram(n_words)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.time()
    merges = _merge_loop(words, n_merges)
    t_train = time.time() - t0
    print(f"string train: {len(merges)} merges in {t_train:.1f}s")

    from spark_relieffc_fselection_spark.operators.bpe_ids import (
        encode_word_ids,
        merge_ranks_from_string_chain,
        render_id,
    )

    t0 = time.time()
    bridged = merge_ranks_from_string_chain(merges)
    t_bridge = time.time() - t0
    ranks = {pair: (m, nid) for m, (nid, pair) in enumerate(bridged, 1)}
    print(f"bridge: {len(bridged)} ranks in {t_bridge:.2f}s")

    t0 = time.time()
    n_toks = 0
    for w, _wc in words:
        n_toks += len(encode_word_ids([ord(c) for c in w], ranks))
    enc_wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(
        f"bridged encode: {len(words)} words -> {n_toks} tokens in "
        f"{enc_wall:.1f}s ({len(words) / enc_wall:.0f} words/s "
        f"single-threaded) under the {len(merges)}-merge STRING chain; "
        f"peak rss {rss1:.0f} MB (+{rss1 - rss0:.0f})"
    )

    # sampled parity vs the stacked replace (the retired serving plan)
    rng = random.Random(7)
    expand = {nid: pair for nid, pair in bridged}
    memo: dict[int, str] = {}
    sample = rng.sample(words, min(200, len(words)))
    t0 = time.time()
    for w, _wc in sample:
        s = w
        for ph, pair in merges:
            s = s.replace(pair, ph)
        stacked = list(s)
        for i, ph in enumerate(stacked):
            for p, pr in reversed(merges):
                ph = ph.replace(p, pr)
            stacked[i] = ph
        ids = encode_word_ids([ord(c) for c in w], ranks)
        rendered = [render_id(t, expand, memo) for t in ids]
        assert rendered == stacked, (w, rendered, stacked)
    t_par = time.time() - t0
    print(
        f"parity: {len(sample)} sampled words, stacked-replace == "
        f"bridged rank encode ({t_par:.1f}s for the STACKED side alone "
        f"— {t_par / len(sample) * 1000:.0f} ms/word under a "
        f"{len(merges)}-deep chain, the cost the bridge retires)"
    )


if __name__ == "__main__":
    if "--bridge" in sys.argv:
        bridge_main()
    else:
        main()
