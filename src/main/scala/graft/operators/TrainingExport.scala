package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end SFT export — the composition a user actually runs to turn
  * raw transcripts into a training corpus, assembled from this engine's
  * oracled pieces:
  *
  *   1. GATE on structure: the conversation must open with a user/system
  *      turn ([[Conversations.integrity]]'s first_role signal);
  *   2. GATE on content: conversations that are mostly canned turns
  *      (template share ≥ `cannedMaxPermille`, [[Conversations.cannedTurns]])
  *      are dropped;
  *   3. SCRUB PII per turn ([[graft.text.Redact]] — emails, IPv4s, long
  *      digit runs), on the survivors only;
  *   4. NORMALIZE: merge consecutive same-role turns
  *      ([[Conversations.mergeConsecutiveRoles]]);
  *   5. RENDER one example per conversation ([[Conversations.renderChat]])
  *      plus the supervision density (`train_chars` — characters inside
  *      assistant segments, the numerator of the loss-mask ratio).
  *
  * Scale shape: every stage is keyed on conv_id (the gates are per-conv
  * aggregates joined back as an equi-join — conversation count scales with
  * the corpus, so no broadcast) except the canned-turn hotness aggregate,
  * which is keyed on the 128-bit content hash; the wide turn text shuffles
  * only for the merge/render stages, where it IS the payload.
  */
object TrainingExport {

  def sftExamples(transcripts: DataFrame, maxTurns: Int = 4096,
                  cannedMaxPermille: Int = 500, minConvs: Int = 3): DataFrame = {
    val opening = transcripts.groupBy("conv_id")
      .agg(min(struct(col("turn_idx"), col("role"))).getField("role")
        .as("first_role"))
    val canned = Conversations.cannedTurns(transcripts, minConvs)
    val keep = opening.join(canned, "conv_id")
      .filter(col("first_role").isin("user", "system") &&
        col("canned_permille") < cannedMaxPermille)
      .select("conv_id")

    val scrubbed = transcripts.join(keep, "conv_id")
      .withColumn("text", graft.text.Redact.redact(col("text")))
    val merged = Conversations.mergeConsecutiveRoles(scrubbed)
      .select(col("conv_id"), col("merged_idx").cast("int").as("turn_idx"),
        col("role"), col("text"))

    val rendered = Conversations.renderChat(merged, maxTurns)
    val trainChars = merged.filter(col("turn_idx") < maxTurns)
      .groupBy("conv_id")
      .agg(coalesce(sum(when(col("role") === "assistant",
        length(col("role")).cast("long") + length(col("text")) + 4L)), lit(0L))
        .as("train_chars"))
    rendered.join(trainChars, "conv_id")
      .select("conv_id", "n_turns", "n_chars", "train_chars", "rendered")
  }

  /** SFT sequence packing over [[sftExamples]] output: rendered examples
    * laid end-to-end (one separator char between examples) into
    * fixed-`budgetChars` training sequences, per shard — the same
    * spill-across-boundary semantics as [[graft.text.Packing.pack]], with
    * `train_chars` carried through so downstream can compute per-pack
    * supervision density.
    *
    * The shard key is the charwise polynomial hash of conv_id (shared with
    * the oracle) so no engine-specific hash leaks into the contract; like
    * Packing.pack, the per-shard window avoids a global running sum and
    * `shards` scales with the cluster. Offsets use integer division
    * (IntegralDivide) — exact past 2^53 where double math would drift. */
  def packedExamples(examples: DataFrame, budgetChars: Int = 4096,
                     shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("conv_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    examples
      .select(col("conv_id"), col("n_chars"), col("train_chars"),
        (graft.text.TextAnalysis.tokHash(col("conv_id")) % shards).as("shard"))
      .withColumn("start_c",
        coalesce(sum(col("n_chars") + 1).over(w), lit(0L)))
      .select(col("conv_id"), col("shard"), col("n_chars"), col("train_chars"),
        expr(s"start_c DIV $budgetChars").as("pack_idx"),
        (col("start_c") % budgetChars).as("pack_offset"))
  }

  /** Per-pack supervision density over [[packedExamples]] output: how many
    * examples START in each pack and what fraction of their characters is
    * supervised (assistant segments) — the batch-composition diagnostic a
    * training run reads before setting loss scaling. Each example is
    * attributed to the pack its first character lands in (spilled tails
    * are not re-split — documented approximation). Pack-count-sized
    * aggregate reusing the shard clustering the packer already produced. */
  def packDensity(packed: DataFrame): DataFrame =
    packed.groupBy("shard", "pack_idx")
      .agg(count(lit(1)).as("n_examples"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("train_chars")).as("sum_train_chars"))
      .withColumn("density_permille",
        floor(col("sum_train_chars") * lit(1000.0) / col("sum_chars")).cast("long"))

  /** Per-shard dataset MANIFEST — the reproducibility record shipped next
    * to an exported corpus: row count, char mass, id span, and an
    * ORDER-INDEPENDENT content checksum per shard, so a re-export (or a
    * re-shuffled copy) can be byte-verified without re-sorting anything.
    * The checksum is a mod-sum of per-doc 32-bit content hashes
    * (Σ (md5₃₂(text) mod 1000003) mod 1000003): commutative and
    * associative, so it map-side-combines, merges across partitions in
    * any order, and folds incrementally as shards grow. One hash-agg
    * total; the wrap bound (2⁶³/1000003 ≈ 9·10¹² rows per shard) is far
    * past any real shard. */
  def shardManifest(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val h32 = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
    docs
      .select(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("doc_id"), length(col("text")).cast("long").as("nc"),
        (h32 % 1000003L).as("hm"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("sum_chars"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"),
        (sum(col("hm")) % 1000003L).as("checksum"))
  }

  /** Curriculum interleave key — the deterministic EPOCH ORDERING for a
    * multi-source curriculum: within each source, docs rank easy→hard
    * (difficulty = char length, doc_id tiebreak); the global key
    * `(rk−1)·|sources| + (src_idx−1)` round-robins the sources within
    * every difficulty tier, so a training run that consumes the corpus in
    * key order sees (a) difficulty rising monotonically per source and
    * (b) every source represented evenly throughout the epoch — the two
    * properties a naive ORDER BY difficulty (source-clumped at equal
    * lengths) and a random shuffle (no curriculum) each lack.
    *
    * Scale shape: ONE window shuffle keyed on source for the per-source
    * rank; the source index and source count ride a broadcast of the
    * |sources|-row dimension (its unpartitioned rank window runs on that
    * aggregate-sized frame, never the corpus). No global sort is
    * materialized — the key IS the order, and a partitioned writer can
    * range-partition on it. */
  def curriculumInterleave(docs: DataFrame): DataFrame = {
    val srcW = org.apache.spark.sql.expressions.Window.orderBy("source")
    val srcIdx = docs.select(col("source")).distinct()
      .withColumn("src_idx", row_number().over(srcW).cast("long"))
    val nSrc = srcIdx.agg(max(col("src_idx")).as("n_sources"))
    val rkW = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("difficulty"), col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("difficulty"))
      .join(broadcast(srcIdx), Seq("source"))
      .crossJoin(broadcast(nSrc))
      .withColumn("rk", row_number().over(rkW).cast("long"))
      .withColumn("epoch_key",
        (col("rk") - 1L) * col("n_sources") + (col("src_idx") - 1L))
      .select("doc_id", "source", "difficulty", "src_idx", "rk", "epoch_key")
  }

  /** Deterministic multi-EPOCH shuffle plan — reproducible training-data
    * ordering: per epoch, every document gets a fresh pseudo-random
    * position (md5 of epoch:doc_id), a shard from the key's head bits,
    * and its rank within (epoch, shard). Re-running the export yields the
    * identical order — the property an ad-hoc `ORDER BY rand()` loses and
    * the reason reproducible-training pipelines hash instead of shuffle.
    *
    * Scale shape: the epoch fan-out is a map-side explode (epochs is a
    * small constant); ordering is one window per (epoch, shard) —
    * shards × epochs independent sort tasks, each 1/shards of an epoch.
    * No global sort ever materializes. */
  def epochShuffle(docs: DataFrame, epochs: Int = 3,
                   shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "shard").orderBy(col("k"), col("doc_id"))
    docs.select(col("doc_id"),
        explode(expr(s"sequence(0L, ${epochs - 1}L)")).as("epoch"))
      .withColumn("k",
        md5(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string"))))
      .withColumn("shard",
        (conv(substring(col("k"), 1, 8), 16, 10).cast("long") % shards)
          .as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "epoch", "shard", "pos")
  }

  /** T5-style SPAN-CORRUPTION export — the denoising-objective shape
    * beside the SFT ([[sftExamples]]) and FIM exports: token blocks are
    * deterministically "corrupted", the inputs keep one sentinel per
    * corrupted span, the targets spell each sentinel + its original
    * tokens and close with a final sentinel. Corruption is a pure
    * expression gate — block b of a doc corrupts iff
    * `(doc_id·1000003 + b) mod 7 = 0` (~1/7 of 3-token blocks ≈ 14%
    * noise density, the T5 default ballpark) — so the same example set
    * regenerates bit-identically on every run/engine, which is what
    * makes the export auditable.
    *
    * Shape: posexplode to (doc, pos, tok) (the q102 rebuild family);
    * corrupted-block sentinel numbers come from ONE per-doc window over
    * the block GRID (blocks, not tokens); inputs/targets reassemble with
    * an ordered collect per doc — the one conv-sized exchange, identical
    * to every other per-doc rebuild in this engine. */
  def spanCorruption(docs: DataFrame, blockLen: Int = 3,
                     gateMod: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.select(col("doc_id"),
        posexplode(graft.text.TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .withColumn("b", expr(s"pos DIV $blockLen"))
      .withColumn("corrupted",
        pmod(col("doc_id") * lit(1000003L) + col("b"), lit(gateMod.toLong))
          === 0)
    val wB = Window.partitionBy("doc_id").orderBy("b")
    val spans = tk.filter(col("corrupted"))
      .select(col("doc_id"), col("b")).distinct()
      .withColumn("k", (row_number().over(wB) - 1).cast("long"))
    val pieces = tk.join(spans, Seq("doc_id", "b"), "left")
      .withColumn("inp_piece",
        when(!col("corrupted"), col("tok"))
          .when(col("pos") === col("b") * blockLen,
            concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))))
      .withColumn("tgt_piece",
        when(col("corrupted") && col("pos") === col("b") * blockLen,
          concat(lit("<extra_id_"), col("k").cast("string"), lit("> "), col("tok")))
          .when(col("corrupted"), col("tok")))
    pieces.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(when(col("corrupted"), col("b"))).as("n_spans"),
        array_join(transform(array_sort(collect_list(
          when(col("inp_piece").isNotNull,
            struct(col("pos"), col("inp_piece").as("p"))))),
          t => t("p")), " ").as("inputs"),
        array_join(transform(array_sort(collect_list(
          when(col("tgt_piece").isNotNull,
            struct(col("pos"), col("tgt_piece").as("p"))))),
          t => t("p")), " ").as("tgt_body"))
      .withColumn("targets",
        when(col("tgt_body") === "",
          concat(lit("<extra_id_"), col("n_spans").cast("string"), lit(">")))
          .otherwise(concat(col("tgt_body"), lit(" <extra_id_"),
            col("n_spans").cast("string"), lit(">"))))
      .select("doc_id", "n_tokens", "n_spans", "inputs", "targets")
  }
}
