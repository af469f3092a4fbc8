"""orchid_fst_spark — a from-scratch PySpark-native entity-resolution engine.

Re-expresses the query semantics of the reference dictionary engine
(apollo008/orchid-fst, C++ FST + Levenshtein automata) as an idiomatic
Spark pipeline: DataFrame-declared plans, Catalyst-optimized predicates
for exact/prefix/range lookups, and vectorized Arrow UDFs only where the
built-ins genuinely cannot express the semantics (edit-distance automaton
intersection, Damerau distance, per-block candidate generation).

Layout
------
functions/   pure + vectorized kernels (edit distances, Jaro-Winkler,
             normalization, text-quality metrics)
automata/    driver-side Levenshtein/Damerau DFA compiler + trie
             intersection (runs inside Arrow UDFs on executors)
operators/   dictionary query API (match/prefix/range/fuzzy), fuzzy join,
             dedup family, similarity search, sort policies, multimodal
er/          record-linkage pipeline: normalize -> block -> candidates ->
             score -> cluster -> resolve, with checkpoint/resume
sources/     deterministic fixture generators (pages, dict tables)
streaming/   structured-streaming variants (incremental exact dedup)
"""

__version__ = "0.1.0"
