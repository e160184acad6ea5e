package graft.operators

/** THE single source of the frozen-index ANN operating point, shared by
  * the gates (SparkEntry) and their DuckDB oracle replicas
  * (SparkEntryOracles). The oracle SQL is string-interpolated from these
  * values, so changing a default here re-derives BOTH sides — the failure
  * mode where a gate retunes (say rerankFactor) while the oracle keeps a
  * hardcoded literal, desynchronizing them with no pointer to the cause,
  * is structurally gone. Gates additionally assert the testdata embedding
  * dimension equals numSubspaces·subLen before freezing, so a dimension
  * change surfaces as an explicit error, not a silent encode mismatch. */
object AnnConfig {
  /** PQ subspace count (m) — bytes per encoded vector. */
  val numSubspaces: Int = 8
  /** Dimensions per subspace; embedding dim must equal m·subLen. */
  val subLen: Int = 8
  /** Codewords per subspace (one byte of code addresses them all). */
  val codebookSize: Int = 256
  /** Neighbors returned per query. */
  val k: Int = 10
  /** ADC candidates re-ranked exactly = k·rerankFactor. */
  val rerankFactor: Int = 4
  def rerankR: Int = k * rerankFactor
  /** ANN gates score queries vec_id < maxQueries. */
  val maxQueries: Int = 20
  /** Hybrid-retrieval gates use queries id < hybridQueries. */
  val hybridQueries: Int = 4
  /** SQ8 operating point: one linear byte quantizer per dimension over
    * the full embedding dim (= numSubspaces·subLen one-element
    * subspaces) with sqLevels codewords each. */
  def sqDim: Int = numSubspaces * subLen
  val sqLevels: Int = 256
  /** q_ann_ivf_kmeans operating point: C lists, nProbe probes (25% scan). */
  val kmeansLists: Int = 128
  val kmeansProbes: Int = 32
  /** q_ann_lsh multi-probe operating point: numBands bands of lshBits
    * sign bits, 2^lshFlipBits probes per band (flips of the lowest-margin
    * bits). Tuned on the sf0.01 evidence corpus: recall@10 = 0.810 at a
    * MEASURED 24.2% distinct-candidate scan (r12 sweep; the nominal
    * bands·2^flips/2^bits = 21.9% underestimates because probed buckets
    * correlate with corpus occupancy near the query). */
  val lshBits: Int = 12
  val lshBands: Int = 224
  val lshFlipBits: Int = 2
  /** q_ann_ivfpq_range operating point (FAISS range_search on IndexIVFPQ):
    * report neighbors whose EXACT cosine >= rangeRadius, drawn from probed
    * candidates whose ADC approximation scores >= rangeRadius −
    * rangeMargin. The radius sits at ~p99 of the testdata's pairwise
    * cosine distribution (isotropic corpus — max pair ~0.49 at sf0.01),
    * so the result set is ~1% of probed pairs; the margin absorbs ADC
    * quantization error at the boundary. Both constants are interpolated
    * into the oracle replica, so engine and oracle threshold identically. */
  val rangeRadius: Double = 0.30
  val rangeMargin: Double = 0.10
}
