"""PySpark bindings for the graft decomposition engine (S9).

Mirrors the reference's Python surface — ``OaxacaBlinder(df, ...)``
with ``fit()`` / ``fit_quantile(q)`` / ``optimize_budget(b)`` — on top
of PySpark: the DataFrame you pass in IS a distributed pyspark
DataFrame, and results come back as pyspark DataFrames plus plain
Python scalars/strings. No extra dependencies: the wrapper drives the
JVM-side ``graft.api.PyApi`` facade over Spark's own py4j gateway.

Setup: start PySpark with the graft jar on the driver classpath::

    spark = (SparkSession.builder
        .config("spark.jars", "/path/to/graft.jar")
        .config("spark.driver.extraClassPath", "/path/to/graft.jar")
        .getOrCreate())

    from graft import OaxacaBlinder
    results = OaxacaBlinder(df, "wage", "gender", "F",
                            predictors=["education", "experience"],
                            categorical_predictors=["sector"],
                            bootstrap_reps=100).fit()
    print(results.summary())
    results.df.show()
"""

from pyspark.sql import DataFrame

__all__ = ["OaxacaBlinder", "OaxacaResults", "BudgetResult", "DflResult",
           "AkmResult", "run_dfl", "estimate_akm", "match_units",
           # LLM-pipeline extension operators
           "exact_duplicates", "drop_exact_duplicates", "minhash_lsh_pairs",
           "simhash_pairs", "jaccard_pairs", "embedding_neardup_pairs",
           "assign_clusters", "ann_topk", "ann_ivf_topk",
           "stratified_sample", "topk_by_score", "token_budget_sample",
           "seq_pack", "flag_contaminated", "remove_contaminated"]


class OaxacaResults:
    """Decomposition results: scalars, report strings, and DataFrames."""

    def __init__(self, jhandle, spark):
        self._h = jhandle
        self._spark = spark

    @property
    def total_gap(self):
        return self._h.totalGap()

    @property
    def n_a(self):
        return self._h.nA()

    @property
    def n_b(self):
        return self._h.nB()

    @property
    def df(self):
        """Aggregate decomposition table as a pyspark DataFrame."""
        return DataFrame(self._h.aggregateDf(), self._spark)

    @property
    def detailed(self):
        """Per-variable detailed components as a pyspark DataFrame."""
        return DataFrame(self._h.detailedDf(), self._spark)

    def to_json(self):
        return self._h.toJson()

    def summary(self):
        return self._h.summary()

    def interpret(self):
        """Plain-language interpretation (reference: ``interpret()``)."""
        return self._h.interpret()

    def plot_svg(self):
        """Bar chart of the decomposition as an SVG string (dependency-
        free stand-in for the reference's matplotlib ``plot()``)."""
        return self._h.svgBar()

    def __repr__(self):
        return ("OaxacaResults(total_gap=%.6f, n_a=%d, n_b=%d)"
                % (self.total_gap, self.n_a, self.n_b))


class BudgetResult:
    """Pay-equity optimization results."""

    def __init__(self, jhandle, spark):
        self._h = jhandle
        self._spark = spark

    @property
    def adjustments(self):
        """Per-row pay adjustments as a pyspark DataFrame."""
        return DataFrame(self._h.adjustments(), self._spark)

    @property
    def total_cost(self):
        return self._h.totalCost()

    @property
    def original_gap(self):
        return self._h.originalGap()

    @property
    def new_gap(self):
        return self._h.newGap()

    @property
    def original_unexplained_gap(self):
        return self._h.originalUnexplainedGap()

    @property
    def new_unexplained_gap(self):
        """The optimizer's objective: the fair-model unexplained gap."""
        return self._h.newUnexplainedGap()

    @property
    def required_budget(self):
        return self._h.requiredBudget()


class DflResult:
    """DFL reweighting densities on a 100-point outcome grid."""

    def __init__(self, jhandle):
        self._h = jhandle

    @property
    def grid(self):
        return list(self._h.grid())

    @property
    def density_a(self):
        return list(self._h.densityA())

    @property
    def density_b(self):
        return list(self._h.densityB())

    @property
    def density_b_counterfactual(self):
        return list(self._h.densityBCounterfactual())

    @property
    def logit_converged(self):
        return self._h.logitConverged()


class AkmResult:
    """AKM two-way fixed effects results."""

    def __init__(self, jhandle, spark):
        self._h = jhandle
        self._spark = spark

    @property
    def beta(self):
        return list(self._h.beta())

    @property
    def control_names(self):
        return list(self._h.controlNames())

    @property
    def worker_effects(self):
        return DataFrame(self._h.workerEffects(), self._spark)

    @property
    def firm_effects(self):
        return DataFrame(self._h.firmEffects(), self._spark)

    @property
    def r2(self):
        return self._h.r2()

    @property
    def n_obs(self):
        return self._h.nObs()


def run_dfl(dataframe, outcome, group, reference_group, predictors):
    """DFL reweighting (reference: ``run_dfl_from_csv``; pass
    ``spark.read.csv(path, header=True, inferSchema=True)`` for the
    CSV case)."""
    jvm = dataframe.sparkSession._jvm
    h = jvm.graft.api.PyApi.runDfl(dataframe._jdf, outcome, group,
                                   reference_group, list(predictors))
    return DflResult(h)


def estimate_akm(dataframe, outcome, worker_col, firm_col, controls=None,
                 tolerance=1e-8, max_iters=1000):
    """AKM two-way fixed effects on the largest connected set."""
    spark = dataframe.sparkSession
    h = spark._jvm.graft.api.PyApi.estimateAkm(
        dataframe._jdf, outcome, worker_col, firm_col,
        list(controls or []), float(tolerance), int(max_iters))
    return AkmResult(h, spark)


def match_units(dataframe, treatment_col, covariates, k, method, id_col):
    """k-NN matching (``euclidean | mahalanobis | propensity``);
    returns the INPUT rows with an appended ``__match_weight__`` column
    (treated rows weight 1.0, each control 1/k per treated row that
    matched it, unmatched controls 0.0) as a pyspark DataFrame — not
    pair rows."""
    spark = dataframe.sparkSession
    jdf = spark._jvm.graft.api.PyApi.matchUnits(
        dataframe._jdf, treatment_col, list(covariates), int(k), method,
        id_col)
    return DataFrame(jdf, spark)


def _api(dataframe):
    return dataframe.sparkSession._jvm.graft.api.PyApi


def _wrap(dataframe, jdf):
    return DataFrame(jdf, dataframe.sparkSession)


# ---------------------------------------------------------------------------
# LLM-pipeline extension operators: dedup, ANN, sampling, packing, decontam.
# Each takes/returns pyspark DataFrames; shapes match the Scala ext/ API.
# ---------------------------------------------------------------------------

def exact_duplicates(dataframe, id_col, text_col):
    """Exact duplicate groups: one row per duplicated content hash with
    the member ids."""
    return _wrap(dataframe, _api(dataframe).exactDuplicates(
        dataframe._jdf, id_col, text_col))


def drop_exact_duplicates(dataframe, id_col, text_col):
    """The corpus minus exact duplicates (smallest id per content kept)."""
    return _wrap(dataframe, _api(dataframe).dropExactDuplicates(
        dataframe._jdf, id_col, text_col))


def minhash_lsh_pairs(dataframe, id_col, text_col, shingle_n=3,
                      num_hashes=16, bands=8, threshold=0.8):
    """MinHash-LSH near-duplicate candidate pairs, verified with exact
    Jaccard at ``threshold``."""
    return _wrap(dataframe, _api(dataframe).minhashLshPairs(
        dataframe._jdf, id_col, text_col, int(shingle_n), int(num_hashes),
        int(bands), float(threshold)))


def simhash_pairs(dataframe, id_col, text_col, max_hamming=3, bits=16):
    """SimHash near-dup pairs within ``max_hamming`` bits (pigeonhole
    banding; lossless). Use bits=56 at corpus scale."""
    return _wrap(dataframe, _api(dataframe).simhashPairs(
        dataframe._jdf, id_col, text_col, int(max_hamming), int(bits)))


def jaccard_pairs(dataframe, id_col, text_col, n=3, threshold=0.5,
                  max_shingle_df=None):
    """Exact n-gram Jaccard similarity pairs above ``threshold``;
    ``max_shingle_df`` caps hot-shingle fan-out at scale (None = no cap)."""
    return _wrap(dataframe, _api(dataframe).jaccardPairs(
        dataframe._jdf, id_col, text_col, int(n), float(threshold),
        int(max_shingle_df or 0)))


def embedding_neardup_pairs(dataframe, id_col, vec_col, threshold=0.95,
                            n_blocks=16):
    """Exact embedding-cosine near-dup pairs above ``threshold``."""
    return _wrap(dataframe, _api(dataframe).embeddingNearDupPairs(
        dataframe._jdf, id_col, vec_col, float(threshold), int(n_blocks)))


def assign_clusters(docs, id_col, pairs):
    """Join every doc with its near-dup cluster (connected components of
    ``pairs``): appends ``cluster_id`` (min member id) and
    ``is_canonical`` (the kept row per cluster)."""
    return _wrap(docs, _api(docs).assignClusters(
        docs._jdf, id_col, pairs._jdf))


def ann_topk(queries, corpus, id_col, vec_col, k=10):
    """Exact brute-force cosine top-k: (query_id, neighbor_id, cosine,
    rank) rows. ``id_col`` must be unique on both sides."""
    return _wrap(queries, _api(queries).annTopK(
        queries._jdf, corpus._jdf, id_col, vec_col, int(k)))


def ann_ivf_topk(queries, corpus, id_col, vec_col, k=10, n_cells=0,
                 n_probe=4, seed=42):
    """IVF (KMeans-cell) approximate top-k; ``n_cells=0`` sizes the cell
    count from the corpus. Recall < 1 by construction."""
    return _wrap(queries, _api(queries).annIvfTopK(
        queries._jdf, corpus._jdf, id_col, vec_col, int(k), int(n_cells),
        int(n_probe), int(seed)))


def stratified_sample(dataframe, id_col, strata_col, fractions=None,
                      default_fraction=0.1, salt="graft"):
    """Deterministic per-stratum Bernoulli sampling by id hash — a pure
    scan filter (no shuffle, no RNG state)."""
    jm = dataframe.sparkSession._jvm.java.util.HashMap()
    for k, v in (fractions or {}).items():
        jm.put(k, float(v))
    return _wrap(dataframe, _api(dataframe).stratifiedSample(
        dataframe._jdf, id_col, strata_col, jm, float(default_fraction),
        salt))


def topk_by_score(dataframe, id_col, strata_col, score_col, k,
                  shards=1):
    """The ``k`` best rows per stratum by ``score_col`` (ties by id);
    ``shards > 1`` two-phases the rank so no stratum sorts in one task."""
    return _wrap(dataframe, _api(dataframe).topKByScore(
        dataframe._jdf, id_col, strata_col, score_col, int(k), int(shards)))


def token_budget_sample(dataframe, id_col, strata_col, text_col, budget,
                        buckets=32):
    """Keep documents in hash order until each stratum's token budget is
    spent (first doc crossing the line is kept)."""
    return _wrap(dataframe, _api(dataframe).tokenBudgetSample(
        dataframe._jdf, id_col, strata_col, text_col, int(budget),
        int(buckets)))


def seq_pack(dataframe, id_col, text_col, max_tokens, num_shards=32):
    """Greedy sequence packing: one row per (document, training sequence
    it overlaps) with the doc-relative token span."""
    return _wrap(dataframe, _api(dataframe).seqPack(
        dataframe._jdf, id_col, text_col, int(max_tokens), int(num_shards)))


def flag_contaminated(corpus, id_col, text_col, bench, bench_id_col,
                      bench_text_col, n=8):
    """Docs sharing an n-gram shingle with a (small, broadcast) benchmark
    set: (id, n_hits, n_bench_docs, first_bench_doc)."""
    return _wrap(corpus, _api(corpus).flagContaminated(
        corpus._jdf, id_col, text_col, bench._jdf, bench_id_col,
        bench_text_col, int(n)))


def remove_contaminated(corpus, id_col, text_col, bench, bench_id_col,
                        bench_text_col, n=8):
    """The corpus minus benchmark-contaminated documents."""
    return _wrap(corpus, _api(corpus).removeContaminated(
        corpus._jdf, id_col, text_col, bench._jdf, bench_id_col,
        bench_text_col, int(n)))


class OaxacaBlinder:
    """Oaxaca–Blinder decomposition builder over a pyspark DataFrame.

    Parameter names and defaults follow the reference's Python API;
    ``ref_coefficients`` is one of ``group_a | group_b | pooled |
    cotton``.
    """

    def __init__(self, dataframe, outcome, group, reference_group,
                 predictors=None, categorical_predictors=None,
                 bootstrap_reps=100, weights=None, selection_outcome=None,
                 selection_predictors=None, ref_coefficients="group_b",
                 seed=42):
        self._df = dataframe
        self._spark = dataframe.sparkSession
        self._jvm = self._spark._jvm
        self.outcome = outcome
        self.group = group
        self.reference_group = reference_group
        self.predictors = list(predictors or [])
        self.categorical_predictors = list(categorical_predictors or [])
        self.bootstrap_reps = int(bootstrap_reps)
        self.weights = weights
        self.selection_outcome = selection_outcome
        self.selection_predictors = list(selection_predictors or [])
        self.ref_coefficients = ref_coefficients
        self.seed = int(seed)

    def fit(self):
        """Mean decomposition."""
        h = self._jvm.graft.api.PyApi.fit(
            self._df._jdf, self.outcome, self.group, self.reference_group,
            self.predictors, self.categorical_predictors,
            self.ref_coefficients, self.bootstrap_reps, self.weights,
            self.selection_outcome, self.selection_predictors, self.seed)
        return OaxacaResults(h, self._spark)

    def fit_quantile(self, quantile):
        """RIF-regression decomposition at the given quantile."""
        if not 0.0 < quantile < 1.0:
            raise ValueError("quantile must be in (0, 1)")
        h = self._jvm.graft.api.PyApi.fitQuantile(
            self._df._jdf, self.outcome, self.group, self.reference_group,
            self.predictors, self.categorical_predictors,
            self.ref_coefficients, self.bootstrap_reps, self.weights,
            self.seed, float(quantile))
        return OaxacaResults(h, self._spark)

    def optimize_budget(self, budget, id_col):
        """Budgeted pay-equity optimization (greedy allocation)."""
        h = self._jvm.graft.api.PyApi.optimizeBudget(
            self._df._jdf, self.outcome, self.group, self.reference_group,
            self.predictors, self.categorical_predictors, float(budget),
            id_col)
        return BudgetResult(h, self._spark)
