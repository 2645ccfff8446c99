"""True byte-pair-encoding token counting (driver mandate, SURVEY.md
§2.11 — no reference counterpart; the reference has no text operators
at all).

`operators/text.py:token_count_bpe_regex` counts GPT-2 pre-tokenizer
PIECES; real token budgets need the merge table applied inside each
piece. Two interchangeable implementations:

  * `bpe_token_counts` — the production path: standard greedy BPE
    (min-rank pair, merge all occurrences leftmost-first, repeat) in
    pure Python over Arrow batches via `mapInPandas`. The merge table
    rides the closure (broadcast it explicitly for a 50k-merge GPT-2
    table); per-row work is independent, so the operator is an
    embarrassingly parallel scan at 100 TB.
  * `bpe_count_expr` — the relational rendering used by the DuckDB
    oracle: each piece is char-marked with a separator, then the merge
    table is applied as a chain of literal `replace` calls in rank
    order (leftmost non-overlapping — exactly one BPE pass per rank).

The two agree EXACTLY for causally-ordered merge tables (every merge's
operands are single characters or outputs of earlier merges — true of
any trained table): a merge of rank r creates a symbol whose pairs can
only be later-rank merges, and merging never makes two previously
non-adjacent old symbols adjacent, so no earlier-rank pair can ever
(re)appear after its pass — greedy-by-rank and one-pass-per-rank
produce identical symbol sequences. `tests/test_llm_ops.py` pins both
paths to known counts and to each other; the registry oracle certifies
the Python path against the SQL rendering on every round.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from query_processing_over_streaming_data_using_flink_spark.operators.text import BPE_PRETOKEN_RE

# Symbol framing — control chars stripped from the input on both
# engines before counting, so they can never collide with corpus text.
# Every symbol is stored as MARK+sym+SEP: the start marker makes the
# merge pattern MARK+x+SEP+MARK+y+SEP unambiguous (with a terminator
# alone, "e§s§" would falsely match inside "le§s§" where 'e' is only
# the SUFFIX of symbol "le"); the terminator keeps it unambiguous on
# the right (y can't be a prefix of a longer symbol). BOUND separates
# pre-tokenizer pieces so merges never cross piece boundaries.
BPE_SEP = "\x01"
BPE_BOUND = "\x02"
BPE_MARK = "\x03"

# Demo merge table: ~30 high-frequency English merges, causally
# ordered (operands are single chars or earlier outputs — mechanically
# checked by `validate_merges`). Production swaps in a real trained
# table (e.g. GPT-2's 50k merges loaded from its public merges.txt)
# through the `merges` parameter; the algorithm is rank-order BPE
# either way.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("a", "t"),
    ("s", "t"),
    ("e", "n"),
    ("o", "r"),
    ("a", "r"),
    ("a", "l"),
    ("o", "u"),
    ("i", "t"),
    ("e", "d"),
    ("i", "s"),
    ("in", "g"),
    ("a", "s"),
    ("l", "e"),
    ("e", "s"),
    ("u", "e"),
    ("c", "h"),
    ("s", "s"),
    (" ", "t"),
    (" t", "h"),
    (" th", "e"),
    (" ", "a"),
    (" ", "s"),
    (" ", "w"),
    (" ", "c"),
)


def validate_merges(merges: tuple[tuple[str, str], ...]) -> None:
    """Raise unless `merges` has the two properties that make
    rank-order passes ≡ greedy BPE:

    1. causal ordering — each operand is a single character or the
       output of an earlier merge, and
    2. unique producers — no symbol string is the output of two
       different merges. Without this the equivalence FAILS: with
       merges (('b','a'),('c','b'),('a','b'),('b','ab'),('ba','b'))
       the later ('ba','b') can create a 'bab' symbol that an
       earlier-rank merge consuming 'bab' has already passed over, so
       the replace chain under-merges where greedy BPE proceeds.
       With unique producers, any occurrence of a symbol exists
       before its consumers' ranks, so no earlier-rank pair can ever
       (re)appear after its pass.

    Trained tables (e.g. GPT-2's merges.txt) satisfy both by
    construction — each merge line introduces one new vocabulary
    entry."""
    formed = set()
    for i, (x, y) in enumerate(merges):
        for part in (x, y):
            if len(part) > 1 and part not in formed:
                raise ValueError(
                    f"merge {i} {x!r}+{y!r}: operand {part!r} is neither a "
                    "single character nor the output of an earlier merge"
                )
        out = x + y
        if out in formed:
            raise ValueError(
                f"merge {i} {x!r}+{y!r}: output {out!r} is already produced "
                "by an earlier merge — duplicate producers break the "
                "rank-order-pass ≡ greedy-BPE equivalence"
            )
        formed.add(out)


def bpe_piece(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard greedy BPE on one pre-tokenizer piece: repeatedly merge
    every occurrence (leftmost-first) of the lowest-rank adjacent pair."""
    symbols = list(word)
    while len(symbols) > 1:
        best = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, symbols[i], symbols[i + 1])
        if best is None:
            break
        _, a, b = best
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_count_text(text: str, ranks: dict[tuple[str, str], int], pat: re.Pattern) -> int:
    """Total BPE token count of one document (sum over pieces)."""
    clean = text.replace(BPE_SEP, "").replace(BPE_BOUND, "").replace(BPE_MARK, "")
    return sum(len(bpe_piece(piece, ranks)) for piece in pat.findall(clean))


def bpe_token_counts(
    docs: DataFrame,
    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES,
    carry: tuple[str, ...] = (),
    spread: bool = True,
) -> DataFrame:
    """(doc_id, n_pieces, n_tokens_bpe) per document — the production
    path: Arrow-batched pure-Python BPE via `mapInPandas` (no
    row-at-a-time UDF; the merge table rides the closure). `carry`
    names extra columns to pass through unchanged (types copied from
    the input schema — e.g. `lang` for per-language rollups, bigint
    `n_chars` for fertility) so downstream aggregates never need a
    corpus-scale self-join back onto `documents`."""
    from query_processing_over_streaming_data_using_flink_spark.operators.layout import fanout

    validate_merges(merges)
    ranks = {m: i for i, m in enumerate(merges)}
    # Greedy BPE is the most CPU-expensive per-row op in the repo; an
    # under-parallel input would run every Arrow batch on one core.
    # `spread=False` opts a caller out — for plans that re-evaluate the
    # count subtree under a join where the extra exchange measured as a
    # net loss (interleaved A/B: mixture_bpe_token_budget 1.67->2.14s).
    if spread:
        docs = fanout(docs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = re.compile(BPE_PRETOKEN_RE)
        for pdf in batches:
            # NULL text stays NULL (matching the SQL oracle's regexp/
            # replace chain over NULL) — astype(str) would fabricate
            # the literal string 'None' and count its tokens.
            texts = [None if pd.isna(t) else str(t) for t in pdf["text"]]
            out = {
                "doc_id": pdf["doc_id"],
                "n_pieces": pd.array(
                    [None if t is None else len(pat.findall(t)) for t in texts],
                    dtype="Int64",
                ),
                "n_tokens_bpe": pd.array(
                    [
                        None if t is None else bpe_count_text(t, ranks, pat)
                        for t in texts
                    ],
                    dtype="Int64",
                ),
            }
            for c in carry:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema = "doc_id long, n_pieces long, n_tokens_bpe long" + "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in carry
    )
    return docs.select("doc_id", "text", *carry).mapInPandas(run, schema)


def bpe_count_expr(
    text: Column, merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
) -> Column:
    """BPE token count as a pure Catalyst expression (the oracle path,
    and a JVM-side alternative for small merge tables): pieces are
    char-marked with `BPE_SEP`, joined on `BPE_BOUND` (so merges never
    cross piece boundaries), the merge table applies as a rank-ordered
    chain of literal replaces, and the count is the number of
    surviving separators."""
    validate_merges(merges)
    clean = F.replace(text, F.lit(BPE_SEP), F.lit(""))
    clean = F.replace(clean, F.lit(BPE_BOUND), F.lit(""))
    clean = F.replace(clean, F.lit(BPE_MARK), F.lit(""))
    pieces = F.regexp_extract_all(clean, F.lit(BPE_PRETOKEN_RE), F.lit(0))
    marked = F.transform(
        pieces, lambda p: F.regexp_replace(p, r"(?s)(.)", BPE_MARK + "$1" + BPE_SEP)
    )
    s = F.array_join(marked, BPE_BOUND)
    for x, y in merges:
        s = F.replace(
            s,
            F.lit(BPE_MARK + x + BPE_SEP + BPE_MARK + y + BPE_SEP),
            F.lit(BPE_MARK + x + y + BPE_SEP),
        )
    return (F.length(s) - F.length(F.replace(s, F.lit(BPE_SEP), F.lit("")))).cast(
        "long"
    )


def bpe_count_sql(
    text_expr: str,
    bpe_re_sql: str,
    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES,
) -> str:
    """DuckDB rendering of `bpe_count_expr` (chr(1)/chr(2) literals;
    `bpe_re_sql` is the SQL-quoted pre-tokenizer regex)."""
    validate_merges(merges)

    def q(lit: str) -> str:
        # SQL string literal with control chars via chr() concatenation
        out: list[str] = []
        for ch in lit:
            if ch == BPE_SEP:
                out.append("chr(1)")
            elif ch == BPE_BOUND:
                out.append("chr(2)")
            elif ch == BPE_MARK:
                out.append("chr(3)")
            else:
                out.append("'" + ch.replace("'", "''") + "'")
        return " || ".join(out)

    s = (
        f"array_to_string(list_transform(regexp_extract_all("
        f"replace(replace(replace({text_expr}, chr(1), ''), chr(2), ''), chr(3), ''), "
        f"{bpe_re_sql}), "
        f"p -> regexp_replace(p, '(?s)(.)', chr(3) || '\\1' || chr(1), 'g')), chr(2))"
    )
    for x, y in merges:
        s = (
            f"replace({s}, "
            f"{q(BPE_MARK + x + BPE_SEP + BPE_MARK + y + BPE_SEP)}, "
            f"{q(BPE_MARK + x + y + BPE_SEP)})"
        )
    return f"(length({s}) - length(replace({s}, chr(1), '')))"


def framed_text(text: Column) -> Column:
    """The framed symbol representation (pieces char-marked
    MARK+ch+SEP, joined on BOUND) shared by `bpe_count_expr` and the
    trainer — one definition so application and training can never
    disagree on the framing."""
    clean = F.replace(text, F.lit(BPE_SEP), F.lit(""))
    clean = F.replace(clean, F.lit(BPE_BOUND), F.lit(""))
    clean = F.replace(clean, F.lit(BPE_MARK), F.lit(""))
    pieces = F.regexp_extract_all(clean, F.lit(BPE_PRETOKEN_RE), F.lit(0))
    marked = F.transform(
        pieces, lambda p: F.regexp_replace(p, r"(?s)(.)", BPE_MARK + "$1" + BPE_SEP)
    )
    return F.array_join(marked, BPE_BOUND)


# SQL fragments over the framed string: symbols of one piece, and the
# adjacent-pair structs of a symbol array (0-based indexing).
_SYMS_EXPR = (
    "transform(filter(split(p, '\x03'), t -> t != ''), "
    "t -> left(t, length(t) - 1))"
)
_PAIRS_EXPR = (
    "CASE WHEN size(sy) > 1 THEN "
    "transform(sequence(1, size(sy) - 1), i -> struct(sy[i-1] AS x, sy[i] AS y)) "
    "ELSE array() END"
)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 16,
    text_col: str = "text",
    checkpoint_every: int = 6,
) -> list[tuple[str, str]]:
    """BPE TRAINING as distributed relational ops — the loop that
    produces the merge table `bpe_token_counts` consumes, closing the
    tokenizer story in-engine (train AND apply, both oracle-checkable):
    each round counts adjacent symbol pairs across the whole corpus
    (one explode + hash aggregate — a linear corpus pass), picks the
    most frequent pair (ties → lexicographic (x, y); pairs whose
    concatenation equals an already-formed symbol are skipped, which
    keeps the learned table inside `validate_merges`' unique-producer
    space), and merges every occurrence via the framed-string literal
    replace. The driver loop iterates ROUNDS, not rows — the only
    driver-side data is one argmax row per round (the same bounded
    reduction as `dedup_clusters`' convergence count).

    Determinism: integer pair counts + lexicographic tie-break, so any
    engine, partitioning, or retry learns the identical table — the
    registered oracle replays all rounds in SQL.

    Scale note (the Sennrich trick): BPE statistics depend only on the
    MULTISET of pre-tokenized pieces, never on which document a piece
    came from, and merging never changes word boundaries. So the corpus
    is aggregated ONCE to the distinct-piece frequency table
    (piece → weight) and every round runs over that table with pair
    counts as Σ weight — bit-identical counts (a weighted sum over
    distinct pieces IS the count over instances) at vocabulary-bounded
    per-round cost instead of a full corpus pass per round. At 100 TB
    the distinct-piece table is still millions-of-rows distributed
    state, but ~10³–10⁴× smaller than the corpus; the one corpus scan
    happens up front. Merges can make two distinct framed pieces
    collide (e.g. "a·b" and "ab"); the periodic checkpoint re-aggregates
    to fold such duplicates — harmless either way since all counts are
    weighted sums.

    Returns the learned merge list (causally ordered by construction).
    """
    state = (
        docs.select(
            F.explode(F.split(framed_text(F.col(text_col)), BPE_BOUND)).alias("p")
        )
        .filter(F.col("p") != "")
        .groupBy("p")
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    formed: set[str] = set()
    for rnd in range(1, num_merges + 1):
        pairs = (
            state.select("w", F.expr(_SYMS_EXPR).alias("sy"))
            .select("w", F.explode(F.expr(_PAIRS_EXPR)).alias("pr"))
            .select("pr.x", "pr.y", "w")
        )
        counts = pairs.groupBy("x", "y").agg(F.sum("w").alias("cnt"))
        if formed:
            counts = counts.filter(
                ~F.concat(F.col("x"), F.col("y")).isin(*sorted(formed))
            )
        best = counts.orderBy(F.desc("cnt"), F.asc("x"), F.asc("y")).limit(1).first()
        if best is None:
            break
        x, y = best["x"], best["y"]
        merges.append((x, y))
        formed.add(x + y)
        new_state = state.withColumn(
            "p",
            F.replace(
                F.col("p"),
                F.lit(BPE_MARK + x + BPE_SEP + BPE_MARK + y + BPE_SEP),
                F.lit(BPE_MARK + x + y + BPE_SEP),
            ),
        )
        if rnd % checkpoint_every == 0:
            # Fold pieces that merged into the same framed string, then
            # cut the replace-chain lineage.
            new_state = new_state.groupBy("p").agg(F.sum("w").alias("w"))
            new_state = new_state.localCheckpoint(eager=True)
        else:
            new_state = new_state.persist()
        state.unpersist()
        state = new_state
    state.unpersist()
    validate_merges(tuple(merges))
    return merges
