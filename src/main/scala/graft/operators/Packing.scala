package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sequence packing: assign token-counted chunks to fixed-capacity
 * training sequences (the concat-and-pack step before a pre-training
 * run, where every sequence must fit the model's context window and
 * padding waste is money).
 *
 * Algorithm: greedy NEXT-FIT per partition — chunks stream through in
 * (id) order and a chunk that would overflow the open bin closes it
 * and starts the next. Next-fit is 2-competitive (never more than 2×
 * the optimal bin count) and needs exactly one sequential pass with
 * O(1) state, which is why it is THE streaming packing choice at
 * scale: no sort by size, no cross-partition coordination, each
 * partition packs independently and the sequence id namespaces the
 * partition id into the high bits. Keeping id order also keeps a
 * document's chunks adjacent in the packed sequence — the locality
 * pre-training wants.
 *
 * This is genuine per-partition imperative logic (the bin state is a
 * loop-carried dependency no window/cumsum can express, because the
 * bin boundary depends on every previous decision), i.e. the one
 * shape where `mapPartitions` is the right Spark tool rather than a
 * workaround.
 *
 * Chunks larger than `capacity` get a sequence of their own (callers
 * that want a hard failure instead should pre-filter) — truncation is
 * a modeling decision, not a packing one.
 */
object Packing {

  /**
   * Pack `chunks` rows into sequences of at most `capacity` tokens.
   * Returns (`idCol`, `tokensCol`, `seq_id`); join back on `idCol`
   * for the chunk payloads (ids + token counts pack ~16 bytes/row —
   * the text itself never moves through the packer).
   *
   * @param numPartitions when > 0, repartition by hash(id) first —
   *        deterministic bin assignment for a given partition count;
   *        0 keeps the incoming partitioning (no shuffle at all).
   */
  def pack(chunks: DataFrame, idCol: String, tokensCol: String,
           capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    // loud schema check: a string/UUID id would either throw
    // CAST_INVALID_INPUT mid-job (ANSI, the Spark 4 default) or null
    // out silently (non-ANSI), making the documented join-back on
    // idCol match zero rows
    Seq(idCol, tokensCol).foreach { c =>
      require(chunks.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"pack: column '$c' must be numeric, got ${chunks.schema(c).dataType.sql} " +
          "(map string ids to longs before packing)")
    }
    val spark = chunks.sparkSession
    import spark.implicits._
    val slim = chunks.select(col(idCol).cast("long"), col(tokensCol).cast("long"))
    val parted =
      // RANGE partitioning, not hash: hash(id) scatters consecutive
      // chunk ids across partitions, and each partition packs
      // independently — breaking the documented "a document's chunks
      // stay adjacent in the packed sequence" locality
      if (numPartitions > 0) slim.repartitionByRange(numPartitions, col(idCol))
      else slim
    val packed = parted.sortWithinPartitions(idCol)
      .as[(Long, Long)]
      .mapPartitions { it =>
        packPartition(it, org.apache.spark.TaskContext.getPartitionId().toLong, capacity)
      }
    packed.toDF(idCol, tokensCol, "seq_id")
  }

  /** The pure next-fit loop over one partition's (id, tokens) stream —
    * separated so the invariants (no overflow, 2-competitiveness,
    * oversized isolation) are property-testable without a cluster.
    * seq_id = 24 bits of partition id, 40 bits of local bin counter. */
  private[graft] def packPartition(it: Iterator[(Long, Long)], pid: Long,
                                       capacity: Long): Iterator[(Long, Long, Long)] = {
    var bin = 0L
    var fill = 0L
    it.map { case (id, tok) =>
      if (fill > 0L && fill + tok > capacity) { bin += 1; fill = 0L }
      fill += tok
      (id, tok, (pid << 40) | bin)
    }
  }

  /** Per-sequence roll-up: chunk count, token total, fill ratio.
    * `tokensCol` is explicit — the old positional columns(1) read
    * silently summed the WRONG column on any reordered frame. */
  def sequenceStats(packed: DataFrame, capacity: Long,
                    tokensCol: String): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(tokensCol)).as("seq_tokens"))
      .withColumn("fill_ratio", round(col("seq_tokens") / capacity.toDouble, 4))
}
