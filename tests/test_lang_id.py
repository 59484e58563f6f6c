"""N-gram language ID (Cavnar-Trenkle trigram profiles): accuracy on a
held-out multilingual fixture, beating the round-1 stopword heuristic,
plus profile/normalization determinism."""

import pandas as pd
import pytest

from onnxtr_spark.functions import text as T

# Held-out sentences — none appear in TRAIN_SNIPPETS.
FIXTURE = [
    ("en", "a bright student reads many books about science and history every single evening"),
    ("en", "our team finished the long report before lunch and then reviewed all results together"),
    ("fr", "je voudrais acheter une nouvelle voiture rouge parce que la mienne est très vieille"),
    ("fr", "nous avons mangé du fromage et bu du vin rouge hier soir chez nos amis à paris"),
    ("de", "ich möchte morgen früh mit dem zug nach berlin fahren und meine schwester besuchen"),
    ("de", "das wetter ist heute sehr schön und wir gehen zusammen im park spazieren"),
    ("es", "quiero aprender a cocinar platos nuevos para mi familia durante las vacaciones de verano"),
    ("es", "los estudiantes leen muchos libros en la biblioteca antes de los exámenes finales"),
    ("it", "vorrei comprare una macchina nuova perché la mia è molto vecchia e non funziona bene"),
    ("it", "gli studenti leggono molti libri in biblioteca prima degli esami di fine anno"),
    ("pt", "gostaria de comprar um carro novo porque o meu é muito velho e não funciona bem"),
    ("pt", "os estudantes leem muitos livros na biblioteca antes dos exames finais do ano"),
    ("nl", "ik wil graag een nieuwe auto kopen omdat de mijne erg oud is en niet goed werkt"),
    ("nl", "de studenten lezen veel boeken in de bibliotheek voor de laatste examens van het jaar"),
    ("sv", "jag skulle vilja köpa en ny bil eftersom min är mycket gammal och inte fungerar bra"),
    ("da", "jeg vil gerne købe en ny bil fordi min er meget gammel og ikke virker godt længere"),
    ("pl", "chciałbym kupić nowy samochód ponieważ mój jest bardzo stary i nie działa dobrze"),
    ("tr", "yeni bir araba almak istiyorum çünkü benimki çok eski ve artık iyi çalışmıyor"),
    ("ru", "я хотел бы купить новую машину потому что моя очень старая и плохо работает"),
    ("ru", "студенты читают много книг в библиотеке перед последними экзаменами года"),
    ("el", "θα ήθελα να αγοράσω ένα καινούργιο αυτοκίνητο γιατί το δικό μου είναι πολύ παλιό"),
    ("el", "οι μαθητές διαβάζουν πολλά βιβλία στη βιβλιοθήκη πριν από τις τελικές εξετάσεις"),
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(len(FIXTURE)),
            "text": [t for _, t in FIXTURE],
        })
    )


def test_trigram_model_beats_stopword_heuristic(spark, fixture_df):
    ngram = {r.doc_id: r.pred_lang for r in T.lang_id(fixture_df).collect()}
    stop = {r.doc_id: r.pred_lang for r in T.lang_id_stopword(fixture_df).collect()}
    truth = {i: lang for i, (lang, _) in enumerate(FIXTURE)}
    ngram_acc = sum(ngram[i] == truth[i] for i in truth)
    stop_acc = sum(stop[i] == truth[i] for i in truth)
    assert ngram_acc == len(FIXTURE), f"misses: { {i: (ngram[i], truth[i]) for i in truth if ngram[i] != truth[i]} }"
    # the stopword baseline only knows English: at best 2/8 here
    assert stop_acc <= 2
    assert ngram_acc > stop_acc


def test_non_profile_script_is_unknown(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["今天 天气 很好 我们 去 公园", "1234 5678 --- !!!"]})
    )
    out = {r.doc_id: r.pred_lang for r in T.lang_id(df).collect()}
    assert out[0] == "unknown"  # CJK: no profile trigrams match
    assert out[1] == "unknown"  # no letters at all -> no trigrams


def test_profiles_deterministic_and_ranked():
    p1 = T.build_profile(T.TRAIN_SNIPPETS["fr"])
    p2 = T.build_profile(T.TRAIN_SNIPPETS["fr"])
    assert p1 == p2
    assert sorted(p1.values()) == list(range(1, len(p1) + 1))
    assert len(p1) <= T.PROFILE_SIZE
    # padded-token trigrams: ' le' must rank high in french
    assert " le" in p1


def test_norm_trigrams_mirror():
    tris = T._norm_trigrams("Héllo, Wörld!")
    assert " hé" in tris and "ld " in tris
    assert all(len(t) == 3 for t in tris)
    assert T._norm_trigrams("123 !!!") == []


def test_stratified_sample_rates_and_determinism(spark):
    """The hash gate realizes each stratum's configured fraction within
    binomial noise, is deterministic across calls, and membership is a
    pure function of doc_id (stable under backfills)."""
    import pandas as pd

    rows = []
    for i in range(4000):
        rows.append({"doc_id": i, "lang": ["en", "fr", "zh"][i % 3], "source": "s"})
    docs = spark.createDataFrame(pd.DataFrame(rows))
    fr = {"en": 0.2, "fr": 0.9, "zh": 0.0}
    got = T.stratified_sample(docs, fr, default_frac=0.5).toPandas()
    again = T.stratified_sample(docs, fr, default_frac=0.5).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])
    by_lang = got.groupby("lang").size().to_dict()
    n = 4000 / 3
    assert abs(by_lang.get("en", 0) / n - 0.2) < 0.05
    assert abs(by_lang.get("fr", 0) / n - 0.9) < 0.05
    assert by_lang.get("zh", 0) == 0
    # membership depends only on doc_id+lang: a subset input selects the
    # same docs
    sub = T.stratified_sample(docs.where("doc_id < 2000"), fr, default_frac=0.5).toPandas()
    assert set(sub["doc_id"]) == {d for d in got["doc_id"] if d < 2000}


def test_winnow_guarantee_and_density(spark):
    """The winnowing contract (Schleimer et al. 2003): two docs sharing
    a substring of length >= k+w-1 share at least one fingerprint; a
    doc with no shared substring of that length shares none (here: a
    disjoint alphabet makes it certain); selected density is far below
    the full gram count (~2/(w+1) expected)."""
    import pandas as pd

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [
                "prefix one " + shared + " suffix alpha",
                "other beginning " + shared + " different tail",
                "zzzz qqqq xxxx vvvv kkkk wwww jjjj ffff gggg hhhh",
            ],
        })
    )
    fps = T.winnow_fingerprints(spark.createDataFrame(docs.toPandas()))
    rows = fps.toPandas()
    by_doc = {d: set(g.fp) for d, g in rows.groupby("doc_id")}
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]), "disjoint text must not collide"
    n_grams_1 = len("prefix one " + shared + " suffix alpha") - T.WINNOW_K + 1
    assert len(by_doc[1]) < n_grams_1 / 2  # strong thinning vs all grams


def test_winnow_dup_pairs_finds_planted_near_dup(spark):
    """Two docs built around the same long passage pair up; the
    unrelated doc pairs with nobody; boilerplate shared by EVERY doc is
    suppressed by the max_df cap (no all-to-all clique)."""
    import pandas as pd

    passage = "shared analytics passage about partition pruning and shuffle joins repeated verbatim"
    boiler = "copyright footer terms of service apply everywhere always"
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "intro one " + passage + " " + boiler,
                "another lead " + passage + " closing words " + boiler,
                "totally unrelated content about gardening tulips soil " + boiler,
                "more unrelated prose discussing orbital mechanics " + boiler,
                "fifth piece on sourdough fermentation timing notes " + boiler,
            ],
        })
    )
    pairs = T.winnow_dup_pairs(docs, max_df=2, min_shared=3).toPandas()
    assert set(map(tuple, pairs[["doc_a", "doc_b"]].values.tolist())) == {(1, 2)}


def test_gopher_rules_gates(spark):
    """Each Gopher gate trips on a doc crafted to violate only it."""
    import pandas as pd

    good = "the quick brown fox jumps over that lazy dog have with " * 6  # 60 words, stopwords
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                good,
                "short text only",  # < 50 words
                good + " ###### ###### ###### ######",  # symbol ratio
                "\n".join("- bullet line " + str(i) for i in range(10)) + "\n" + good,  # >90% bullets? 10/11 lines
                good.replace("fox", "1234"),  # alpha frac drops but stays >=0.8 -> still passes
            ],
        })
    )
    got = T.gopher_rules(docs).toPandas().set_index("doc_id")
    assert bool(got.loc[0, "passes"])
    assert not bool(got.loc[1, "passes"]) and got.loc[1, "n_words"] < 50
    assert not bool(got.loc[2, "passes"]) and got.loc[2, "symbol_ratio"] > 0.1
    assert not bool(got.loc[3, "passes"]) and got.loc[3, "bullet_frac"] > 0.9
    assert bool(got.loc[4, "passes"]) and got.loc[4, "alpha_frac"] >= 0.8


def test_pack_sequences_layout(spark):
    """Concatenate-then-chunk invariants: within a shard, doc k starts
    exactly where doc k-1 ended (start = cumsum of lengths), bins cut
    every ctx tokens, and shards pack independently (first doc of every
    shard starts at bin 0 offset 0)."""
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 128, 129],
            "text": ["a b c", "d e f g", "h", "i j", "k l m", "n"],
        })
    )
    got = (
        T.pack_sequences(docs, ctx=4, shard_docs=128)
        .toPandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    # shard 0: lengths 3,4,1,2 -> starts 0,3,7,8 -> (bin,off) (0,0)(0,3)(1,3)(2,0)
    assert got.loc[0, ["bin_in_shard", "bin_offset"]].tolist() == [0, 0]
    assert got.loc[1, ["bin_in_shard", "bin_offset"]].tolist() == [0, 3]
    assert got.loc[2, ["bin_in_shard", "bin_offset"]].tolist() == [1, 3]
    assert got.loc[3, ["bin_in_shard", "bin_offset"]].tolist() == [2, 0]
    # shard 1 restarts at zero
    assert got.loc[128, ["shard", "bin_in_shard", "bin_offset"]].tolist() == [1, 0, 0]
    assert got.loc[129, ["shard", "bin_in_shard", "bin_offset"]].tolist() == [1, 0, 3]


def test_ccnet_buckets_are_rank_tertiles(spark):
    """Within each language the head/middle/tail split is by nll rank
    into thirds: counts differ by at most 1, and every head doc's nll
    <= every tail doc's nll."""
    import pandas as pd

    got = T.ccnet_buckets(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")).toPandas()
    for lang, g in got.groupby("lang"):
        counts = g["bucket"].value_counts()
        assert max(counts) - min(counts) <= 1, (lang, dict(counts))
        if {"head", "tail"} <= set(counts.index):
            assert g[g.bucket == "head"]["nll"].max() <= g[g.bucket == "tail"]["nll"].min()


def _ref_bpe(word: str, merges) -> list[str]:
    """Honest reference BPE apply: per word, merge the ranked pair
    wherever adjacent, scanning left to right, one merge rank at a
    time (the textbook algorithm)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_replace_chain_matches_reference(spark):
    """The space-delimited replace chain IS the BPE merge step: equal
    to the per-word reference on adversarial words (boundary bait like
    'the r', repeats, single chars) and on random corpus text."""
    import numpy as np
    import pandas as pd

    from onnxtr_spark.functions.text import BPE_MERGES, bpe_encode

    rng = np.random.RandomState(7)
    words = ["ther", "thermal", "ererer", "ananan", "t", "standing", "threre", "a", "inin"]
    words += ["".join(rng.choice(list("theransdoi")) for _ in range(rng.randint(1, 10))) for _ in range(40)]
    docs = pd.DataFrame({"doc_id": range(len(words)), "text": words})
    got = bpe_encode(spark.createDataFrame(docs)).toPandas().set_index("doc_id")
    for i, w in enumerate(words):
        assert got.loc[i, "n_bpe"] == len(_ref_bpe(w, BPE_MERGES)), (w, _ref_bpe(w, BPE_MERGES))
    # multi-word doc: no merges across the word boundary
    two = pd.DataFrame({"doc_id": [0], "text": ["t h"]})  # 't'+'h' only merges INSIDE a word
    got2 = bpe_encode(spark.createDataFrame(two)).toPandas()
    assert got2.loc[0, "n_bpe"] == 2


def test_bpe_train_matches_reference_trainer(spark):
    """bpe_train's (merge, count) trajectory equals an honest textbook
    trainer (count adjacent pairs over every word occurrence, argmax
    with (count desc, pair lexicographic) tie-break, a != b candidates,
    merge, repeat) on a random corpus."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    from onnxtr_spark.functions.text import bpe_train

    rng = np.random.RandomState(11)
    texts = [
        " ".join(
            "".join(rng.choice(list("theransdoi")) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    words = [list(w) for t in texts for w in t.split()]

    def ref_train(words, k):
        out = []
        for _ in range(k):
            c = Counter()
            for syms in words:
                for i in range(len(syms) - 1):
                    if syms[i] != syms[i + 1]:
                        c[(syms[i], syms[i + 1])] += 1
            if not c:
                break
            (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((a, b, n))
            nxt = []
            for syms in words:
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                nxt.append(merged)
            words = nxt
        return out

    expected = ref_train(words, 8)
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                         "lang": "en", "source": "s"})
    got = [
        (r["a"], r["b"], r["pair_count"])
        for r in bpe_train(spark.createDataFrame(docs), n_merges=8)
        .orderBy("rank").collect()
    ]
    assert got == expected, (got, expected)


def test_bigram_nll_hand_computed(spark):
    import math

    from onnxtr_spark.functions.text import bigram_nll

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a a"), (2, "z")], "doc_id long, text string"
    )
    out = bigram_nll(docs).toPandas().set_index("doc_id")
    # counts: a=4, b=2, z=1, total=7; bigrams (a,b)x2 (b,a)x1 (a,a)x1; ctx a=3, b=1
    pu = {"a": 4 / 7, "b": 2 / 7, "z": 1 / 7}
    lam, om = 0.7, 1.0 - 0.7

    def interp(pb, w):
        return math.log(lam * pb + om * pu[w])

    nll0 = -(math.log(pu["a"]) + 2 * interp(2 / 3, "b") + interp(1.0, "a")) / 4
    nll1 = -(math.log(pu["a"]) + interp(1 / 3, "a")) / 2
    nll2 = -math.log(pu["z"]) / 1

    def r4(x):
        return math.floor(x * 10000 + 0.5) / 10000

    assert out.loc[0, "n_tokens"] == 4 and abs(out.loc[0, "nll"] - r4(nll0)) < 1e-12
    assert out.loc[1, "n_tokens"] == 2 and abs(out.loc[1, "nll"] - r4(nll1)) < 1e-12
    assert out.loc[2, "n_tokens"] == 1 and abs(out.loc[2, "nll"] - r4(nll2)) < 1e-12


def test_bigram_nll_flags_word_salad(spark):
    from onnxtr_spark.functions.text import bigram_nll

    # same words, natural order repeated vs shuffled transitions: the
    # salad doc's transitions are rarer -> higher bigram NLL
    natural = "the cat sat on the mat " * 8
    salad = "mat the on sat the cat cat mat sat on the the " * 4
    docs = spark.createDataFrame([(0, natural), (1, salad)], "doc_id long, text string")
    out = bigram_nll(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "nll"] > out.loc[0, "nll"]


def test_temperature_mix_flattens_within_budget(spark):
    import pandas as pd

    from onnxtr_spark.functions.text import temperature_mix

    # skewed corpus: 300 'en', 60 'fr', 40 'zh'
    rows = [(i, "en") for i in range(300)] + \
           [(i, "fr") for i in range(300, 360)] + \
           [(i, "zh") for i in range(360, 400)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    out = temperature_mix(docs).toPandas()
    rates = out.groupby("lang")["rate_micros"].first()
    # alpha < 1 flattens: scarcer languages get strictly higher keep rates
    assert rates["zh"] > rates["fr"] > rates["en"]
    # expected kept = budget * N; realized concentrates around it
    assert abs(len(out) - 200) < 40
    # gate is doc-level deterministic: same call, same kept set
    again = temperature_mix(docs).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_temperature_mix_alpha_one_is_identity_rates(spark):
    import pandas as pd

    from onnxtr_spark.functions.text import temperature_mix

    rows = [(i, "en") for i in range(90)] + [(i, "fr") for i in range(90, 120)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    out = temperature_mix(docs, alpha=1.0, budget=0.5).toPandas()
    rates = out.groupby("lang")["rate_micros"].first()
    # alpha=1: P_i = p_i, so every language keeps exactly the budget rate
    assert set(rates) == {500000}
