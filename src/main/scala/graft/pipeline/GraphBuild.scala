package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Mentions
import graft.functions.Keys
import graft.link.PathNorm
import graft.resolve.CallResolver
import graft.schema.{EdgeTypes, NodeTypes}
import graft.util.Ckpt._

/** Graph materialization — the transcript analog of the reference's
  * 15-stage `build_graph` pipeline (ast/src/builder/core.rs:48-235) fused
  * into declarative Dataset transforms:
  *
  *  stages 1–3  (repository/directory/file spine)  -> [[spineNodes]]
  *  stages 5–14 (extraction passes)                -> Mentions.extract (ONE
  *               fused scan — the reference re-scans every file per stage;
  *               SURVEY.md §3.1 notes they fuse on Spark)
  *  stage 15    (resolution + linking)             -> CallResolver + PathNorm
  *  Neo4j MERGE upload                             -> dedup-by-key + write
  *               (dropDuplicates(node_key) ≡ MERGE, A6)
  *
  * Node identity follows create_node_key (utils.rs:82-136); function nodes
  * dedup to their first definition turn per conversation (the reference
  * dedups by NodeKeys, lang/mod.rs:624-640).
  *
  * Scale notes: every per-turn table is keyed by conv_id so the spine,
  * mention, and same-conv resolution work shuffle conv-locally; only the
  * (much smaller) entity/function dimension tables shuffle globally, and
  * the dictionary + endpoint-index joins are broadcast.
  */
object GraphBuild {

  final case class Graph(nodes: DataFrame, edges: DataFrame, mentions: DataFrame)

  /** Committed state consumed by the MERGED incremental build
    * ([[buildMerged]]): the prior run's own outputs, re-read instead of
    * recomputed, so corpus TEXT is only ever scanned for changed
    * conversations.
    *
    *  - `localNodes`: committed node rows of the text-derived, conversation-
    *    local node types (Turn / Function / Var) restricted by the caller to
    *    UNCHANGED conversations — for a conversation whose content did not
    *    change these rows are byte-identical to what a full rebuild would
    *    recompute, so they merge verbatim;
    *  - `dmHits`: the FULL merged (fn_name, conv_id, canonical) projection
    *    of the D16 body-contains scan (the only other text consumer) —
    *    committed rows for unchanged conversations plus a delta-only scan;
    *  - `fullMeta`: the text-free (conv_id, turn_idx, role, tool) projection
    *    of the ENTIRE current corpus — parquet column pruning keeps this at
    *    a fraction of the bytes (text dominates transcript storage), and at
    *    100 TB it is the pruned-scan an Iceberg table serves natively.
    */
  final case class MergedStores(localNodes: DataFrame, dmHits: DataFrame, fullMeta: DataFrame)

  /** The conversation-local, text-derived node types a merged incremental
    * run reuses from the committed node table (everything else is either
    * text-free — recomputed exactly from mentions/resolution — or a global
    * dimension whose membership can shift when ANY conversation changes).
    */
  val MergedLocalTypes: Seq[String] = Seq(NodeTypes.Turn, NodeTypes.Function, NodeTypes.Var)

  /** The conversation-local, pre-canonicalization projection of the D16
    * body-contains scan: (fn_name, conv_id, canonical) per tool turn whose
    * text names a dictionary alias. This is the ONLY text consumer outside
    * the spine/docs/var branches, so committing it (and merging a delta-only
    * scan) lets the merged incremental build avoid unchanged text entirely.
    * Cluster identity is applied downstream (it is global and can change).
    */
  def dmHitsProjection(spark: SparkSession, t: DataFrame): DataFrame = {
    import spark.implicits._
    val dictDf = graft.extract.Dictionary.aliasToCanonical.toSeq.toDF("alias", "canonical")
    t.where(col("role") === "tool")
      .select(col("conv_id"), col("text"),
        regexp_extract(col("text"), graft.extract.Dictionary.handlerPattern, 1).as("fn_name"))
      .where(length(col("fn_name")) > 0)
      .join(broadcast(dictDf), instr(col("text"), col("alias")) > 0)
      .select(col("fn_name"), col("conv_id"), col("canonical"))
      .distinct()
  }

  /** Guard for the MERGE invariant the build relies on instead of a global
    * dedup exchange: every branch emits key-unique rows by construction.
    * That holds for the current extractors over well-formed input, but
    * duplicated input rows (repeated (conv_id, turn_idx)) would silently
    * break it — this check makes the assumption executable. Run it in tests
    * and debug builds (CheckpointedBuild honors SPARK_GRAFT_VALIDATE=1);
    * it is one count over the node table.
    */
  def validateKeyUniqueness(nodes: DataFrame): Unit = {
    val dups = nodes
      .groupBy("node_key")
      .count()
      .where(col("count") > 1)
      .limit(1)
      .collect()
    require(
      dups.isEmpty,
      s"node_key uniqueness invariant violated (e.g. ${dups.headOption.map(_.getString(0))}); " +
        "check the input for duplicated (conv_id, turn_idx) rows"
    )
  }

  /** A4 oversize skip (builder/utils.rs:13 MAX_FILE_SIZE): turns longer than
    * this are materialized in the spine with skipped=true but excluded from
    * extraction (the reference skips parsing such files entirely).
    */
  val MaxTurnChars = 500000

  private val nullConf: Column = lit(1.0)

  /** Empty map<string,string> literal for branches without meta. */
  private val emptyMeta: Column = typedLit(Map.empty[String, String])
  private val nullDocs: Column = lit(null).cast("string")

  private def node(
      nodeType: Column,
      name: Column,
      convId: Column,
      turnIdx: Column,
      body: Column,
      verb: Column,
      docs: Column,
      meta: Column
  ): Seq[Column] = {
    val key = when(verb.isNull, Keys.nodeKey(nodeType, name, convId, turnIdx))
      .otherwise(Keys.nodeKeyWithVerb(nodeType, name, convId, turnIdx, verb))
    Seq(
      nodeType.as("node_type"),
      name.as("name"),
      convId.as("conv_id"),
      turnIdx.as("turn_idx"),
      body.as("body"),
      key.as("node_key"),
      Keys.refId(key).as("ref_id"),
      // A4 per-document content hash + oversize marker (builder/core.rs:298-364)
      sha2(body, 256).as("hash"),
      (length(body) > MaxTurnChars).as("skipped"),
      // NodeData.docs + meta bag (asg.rs:66-82,144-228): docs carry attached
      // comments (B13); meta carries the typed key/value facts the build
      // computes (verb, group, role, nested_in, date, kind)
      docs.as("docs"),
      meta.as("meta")
    )
  }

  private def mkNodes(df: DataFrame, nodeType: String, name: Column, convId: Column,
      turnIdx: Column, body: Column = lit(""), verb: Column = lit(null).cast("string"),
      docs: Column = nullDocs, meta: Column = emptyMeta): DataFrame =
    df.select(node(lit(nodeType), name, convId, turnIdx, body, verb, docs, meta): _*)

  /** Containment spine: Corpus / Conversation / Turn / Role (stages 1–3). */
  def spineNodes(spark: SparkSession, transcripts: DataFrame): DataFrame =
    spineNodes(spark, transcripts, transcripts)

  /** Split-input spine: `tText` supplies the Turn bodies (the only branch
    * that needs `text`); `tMeta` — a text-free projection of the SAME turns —
    * feeds the dimension branches. Column pruning cannot reach past an RDD
    * leaf, so scanning the full checkpoint re-deserializes the dominant text
    * column even for a `conv_id` distinct; the narrow twin restores the
    * pruned-scan behavior a columnar store gives for free.
    */
  def spineNodes(spark: SparkSession, tText: DataFrame, tMeta: DataFrame): DataFrame = {
    val corpus = tMeta
      .limit(1)
      .select(lit("corpus").as("n"))
    val convs = tMeta.select(col("conv_id")).distinct()
    val turns = tText.select(col("conv_id"), col("turn_idx"), col("text"), col("role"))
    val roles = tMeta.select(col("role")).distinct()

    mkNodes(corpus, NodeTypes.Corpus, col("n"), lit(""), lit(-1))
      .unionByName(mkNodes(convs, NodeTypes.Conversation, col("conv_id"), col("conv_id"), lit(-1)))
      .unionByName(
        mkNodes(
          turns,
          NodeTypes.Turn,
          concat(lit("turn-"), col("turn_idx").cast("string")),
          col("conv_id"),
          col("turn_idx"),
          body = col("text"), // per-turn text equality invariant lives here
          meta = map(lit("role"), col("role"))
        )
      )
      .unionByName(mkNodes(roles, NodeTypes.Role, col("role"), lit(""), lit(-1)))
  }

  /** Full build: nodes + edges + the raw mention table. */
  def build(spark: SparkSession, transcripts: DataFrame): Graph = {
    // Spread the corpus across shuffle.partitions tasks keyed by conv_id
    // BEFORE materializing: the raw input is often few/small parquet files
    // (one scan task), which would serialize the extraction pass and every
    // map-side stage hanging off it. At 100 TB the input table is already
    // bucketed by conv_id and this is a no-op repartition.
    //
    // localCheckpoint (not cache) on the two hot tables: ~15 downstream
    // branches hang off t/mentions, and with full lineage each branch
    // carries the whole scan->window->extract plan through analysis + AQE
    // re-planning — at bench scale the single-threaded driver planning
    // dominated wall clock (~8/32 cores busy). Truncating to RDD leaves
    // makes every branch plan O(branch), not O(pipeline). The durable-table
    // equivalent for real clusters is CheckpointedBuild's snapshot commits.
    // t is a LAZY local checkpoint: the eager mentions checkpoint below
    // materializes both in ONE job (t's partitions persist as they stream
    // through the extractor), halving the up-front barrier count.
    // Storage-level study (scale 64, local[8] / local[2] build seconds):
    // deserialized localCheckpoint 115/177, columnar MEMORY_AND_DISK_SER
    // 133/363, DISK_ONLY 156/321. localCheckpoint wins THROUGHPUT at both
    // parallelism levels (its worse 2->8 ratio is the single-box GC/memory
    // artifact, not plan behavior) — so it stays. On a real cluster each
    // executor holds 1/N of the checkpoint, which removes the shared-heap
    // residency that drives the artifact.
    val t = transcripts.repartition(col("conv_id")).lcp(eager = false)
    // ONE fused mapPartitions pass (broadcast trie) instead of the 4-branch
    // Catalyst regex union — identical output (asserted by ExtractionSpec);
    // the Catalyst twin remains the oracle-checked kg_mentions surface.
    // Oversize turns (A4) are spine-only: never fed to the extractor.
    val m = Mentions.extractPartitioned(spark, t.where(length(col("text")) <= MaxTurnChars))
    buildCore(spark, t, m.toDF())
  }

  /** H1 entry point: everything downstream of extraction, over a mention
    * table maintained INCREMENTALLY (see [[Incremental]]) — the reference
    * re-parses only changed files, then re-links the whole (much smaller)
    * graph (graph_ops.rs:95-274).
    */
  def buildFromMentions(spark: SparkSession, transcripts: DataFrame, mentions: DataFrame): Graph = {
    val t = transcripts.repartition(col("conv_id")).lcp(eager = false)
    buildCore(spark, t, mentions)
  }

  /** MERGED incremental build (the reference's remove-by-file + rebuild-
    * changed + restore shape, graph_ops.rs:95-274, made exact): corpus text
    * flows ONLY through `deltaT` (the changed conversations); Turn/Function/
    * Var node rows of unchanged conversations come verbatim from the
    * committed node table, the D16 text scan from the committed dm_hits
    * projection, and every remaining branch — global dimensions, resolution,
    * all edges — recomputes from the (text-free) merged mention table plus
    * the column-pruned `fullMeta` corpus projection. Output is byte-
    * identical to a full rebuild over the current corpus (same oracle as
    * kg_incremental_snapshot; MergedIncrementalSpec asserts nodes AND edges
    * equal, and that the extractor touches only changed conversations).
    */
  def buildMerged(
      spark: SparkSession,
      deltaT: DataFrame,
      mentions: DataFrame,
      stores: MergedStores
  ): Graph = {
    val t = deltaT.repartition(col("conv_id")).lcp(eager = false)
    buildCore(spark, t, mentions, merged = Some(stores))
  }

  /** Resume entry point for [[CheckpointedBuild]]: EVERY expensive upstream
    * stage — mentions, call resolution, entity resolution, api links — is a
    * committed table read back from disk, so a resumed run performs zero
    * extraction and zero resolution work (ResumeSpec counts extractor
    * invocations to prove it). `resolvedEntities` is the pre-canonicalization
    * table (what `resolved_entities` commits); clustering still runs here —
    * it operates on the tiny canonical dimension, not the corpus.
    */
  def buildFromStages(
      spark: SparkSession,
      transcripts: DataFrame,
      mentions: DataFrame,
      resolvedCalls: DataFrame,
      resolvedEntities: DataFrame,
      apiLinks: DataFrame
  ): Graph = {
    val t = transcripts.repartition(col("conv_id")).lcp(eager = false)
    buildCore(spark, t, mentions, Some(resolvedCalls), Some(resolvedEntities), Some(apiLinks))
  }

  private def buildCore(
      spark: SparkSession,
      t: DataFrame,
      mentions0: DataFrame,
      preResolvedCalls: Option[DataFrame] = None,
      preResolvedEntities: Option[DataFrame] = None,
      preApiLinks: Option[DataFrame] = None,
      merged: Option[MergedStores] = None
  ): Graph = {
    // dev-only stage timing (SPARK_GRAFT_PROBE=1): prints the eager steps of
    // graph construction so plan-build cost is attributable
    val probeOn = sys.env.contains("SPARK_GRAFT_PROBE")
    def probe[A](label: String)(f: => A): A =
      if (!probeOn) f
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[buildcore] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
    val mentions = probe("mentions lcp")(mentions0.lcp())
    // Text-free twin of the corpus checkpoint: ~6 dimension/edge branches
    // need only (conv_id, turn_idx, role, tool) but an RDD-leaf scan always
    // deserializes whole rows — through the narrow twin they move ~10% of
    // the bytes. Costs one extra full scan to build; saves one per branch.
    // In MERGED mode `t` carries only the CHANGED conversations; the
    // text-free meta twin must still span the whole corpus (spine dims,
    // containment/role/tool edges, import sections, call resolution), so it
    // comes from the stores' column-pruned full-corpus projection instead.
    val tMeta = merged
      .map(_.fullMeta.select("conv_id", "turn_idx", "role", "tool").lcp(eager = false))
      .getOrElse(t.select("conv_id", "turn_idx", "role", "tool").lcp(eager = false))
    // changed-conversation dimension (merged mode only): scopes the
    // text-derived node branches to the delta so committed rows merge
    // without duplication
    lazy val deltaConvs = broadcast(t.select("conv_id").distinct())

    val entityM = mentions.where(col("mention_type") === "Entity")
    val fnDefs = mentions.where(col("mention_type") === "FunctionDef")
    val fnCalls = mentions.where(col("mention_type") === "FunctionCall")
    val endpoints = mentions.where(col("mention_type") === "Endpoint")
    val requests = mentions.where(col("mention_type") === "Request")
    val tools = mentions.where(col("mention_type") === "Tool")

    // F2 wiring (north rule: canonicalize BEFORE materializing): after the
    // dictionary resolves aliases to canonical ids, MinHash-LSH blocking +
    // iterative connected components (canon/Canon.scala) cluster near-
    // duplicate canonical ids (char-3-gram Jaccard >= 0.3 — merges the hot
    // `sparkengine` into `spark`), and entity identity becomes the cluster
    // label. The cluster dimension is tiny (distinct canonicals), so the CC
    // loop runs on a broadcast-scale table regardless of corpus size.
    val resolvedEntities0 =
      preResolvedEntities.getOrElse(CallResolver.resolveEntities(spark, entityM))
    // one eager materialization of the tiny canonical dimension: every CC
    // consumer (vertices, shingles, candidate pairs) reads the 8-row leaf
    // instead of re-scanning the full mention table per use
    val canonNames = probe("canonNames lcp")(resolvedEntities0
      .select(col("canonical").as("name"))
      .distinct()
      .lcp())
    val clusters = probe("canon CC")(graft.canon.Canon
      .clusters(canonNames, 0.3)
      .withColumnRenamed("name", "canonical"))
    val resolvedEntities = resolvedEntities0
      .join(broadcast(clusters), Seq("canonical"))
      .withColumn("canonical", col("cluster"))
      .drop("cluster")
    val resolvedCalls = probe("resolveCalls")(
      preResolvedCalls.getOrElse(CallResolver.resolveCalls(fnCalls, fnDefs, tMeta)).cache())
    val apiLinks = preApiLinks.getOrElse(PathNorm.linkApi(requests, endpoints))
    val sectionT0 = System.nanoTime()

    // B9 nested scopes via a genuine non-equi RANGE join
    // (lang/mod.rs:667-706): a request is NESTED_IN the nearest preceding
    // handler-definition scope within a 5-turn window of its conversation.
    // The join is conv_id-equi + range filter, so it stays conv-local.
    // Computed up front: feeds both the Request meta bag (nested_in key,
    // graph.rs:199-204 meta lookups) and the NESTED_IN edge branch.
    val nested0Raw = requests
      .select(col("conv_id"), col("turn_idx"), col("name").as("req_name"))
      .join(
        fnDefs.select(col("conv_id"), col("turn_idx").as("def_idx"), col("name").as("fn_name")),
        Seq("conv_id"))
      .where(col("def_idx") < col("turn_idx") && col("turn_idx") <= col("def_idx") + lit(5))
      .groupBy("conv_id", "turn_idx", "req_name")
      .agg(max(struct(col("def_idx"), col("fn_name"))).as("m"))
      .select(col("conv_id"), col("turn_idx"), col("req_name"), col("m.fn_name").as("fn_name"))

    // --- shared mention-derived subtrees, batch-planned -----------------
    // Each is consumed by 2+ node/edge branches, so each gets a LAZY local
    // checkpoint (lineage truncation, one computation). Planning them
    // sequentially cost 3.2-3.7 s of single-threaded driver CPU per build
    // (localCheckpoint resolves the physical plan at call time even when
    // lazy); Ckpt.lcpAll overlaps the 8 independent analyses.
    val instanceIdsRaw = resolvedEntities
      .select(col("name"), col("canonical"))
      .distinct()
    val fnNodes0Raw = fnDefs
      .groupBy(col("name"), col("conv_id"))
      .agg(min(col("turn_idx")).as("turn_idx"))
    val epIdsRaw = endpoints
      .select(PathNorm.canonical(PathNorm.normalizeBackend(col("path"))).as("name"), col("verb"))
      .distinct()
    // B5 get_vars analog: the returned-value binding of each tool turn as a
    // Var node contained by its turn (reference collects per-file variable
    // declarations, lang/mod.rs:604-729)
    val varRows = t
      .withColumn("retval", regexp_extract(col("text"), "returned ([0-9]+)", 1))
      .where(length(col("retval")) > 0)
      .select(col("conv_id"), col("turn_idx"), col("retval"))
    // text-derived + conv-local, so merged mode unions committed rows; the
    // CONTAINS edge branch derives from THIS frame (name/conv/turn are the
    // full edge identity), keeping nodes and edges in lockstep
    val varNodesRaw = merged
      .fold(mkNodes(varRows, NodeTypes.Var, col("retval"), col("conv_id"), col("turn_idx"))) {
        m =>
          mkNodes(varRows, NodeTypes.Var, col("retval"), col("conv_id"), col("turn_idx"))
            .unionByName(m.localNodes.where(col("node_type") === NodeTypes.Var))
      }
    val e2eRowsRaw = requests
      .where(col("name").contains("${id}"))
      .select(col("conv_id"), col("turn_idx"), col("name"),
        regexp_extract(col("name"), "^/api/([a-z]+)", 1).as("res"))
    val pageIdsRaw = requests
      .select(regexp_extract(col("name"), "^/api/([a-z]+)", 1).as("name"))
      .where(length(col("name")) > 0)
      .distinct()
    // pre-cluster hit projection ([[dmHitsProjection]]): recomputed from `t`
    // in full mode; in merged mode the committed projection (plus the
    // caller's delta scan) arrives via the stores — cluster identity is
    // global, so it is applied here in BOTH modes, never persisted
    val dmWithinRaw = merged
      .map(_.dmHits)
      .getOrElse(dmHitsProjection(spark, t))
      .join(broadcast(clusters), Seq("canonical"))
      .select(col("fn_name"), col("conv_id"), col("cluster"))
      .distinct()
    // Package dimension (reference Package variant, mod.rs:30-56): the
    // tool-prefix namespace, one (prefix, tool) membership pair per distinct
    // tool — feeds the Package node branch plus two CONTAINS edge branches
    val pkgPairsRaw = tMeta
      .where(col("tool").isNotNull)
      .select(split(col("tool"), "_").getItem(0).as("name"), col("tool"))
      .distinct()
    // Concept membership (mod.rs:30-56,83-99): curated topic -> the member
    // canonical's post-canonicalization Entity cluster; a Concept exists
    // only when a member entity was observed. Dictionary-bounded dimension.
    val conceptMembersRaw = {
      import spark.implicits._
      clusters
        .join(
          broadcast(graft.extract.Dictionary.conceptTopics.toDF("topic", "canonical")),
          Seq("canonical"))
        .select(col("topic"), col("cluster"))
        .distinct()
    }
    val planned = probe("batch plan (lcpAll x10)")(graft.util.Ckpt.lcpAll(Seq(
      nested0Raw, instanceIdsRaw, fnNodes0Raw, epIdsRaw,
      varNodesRaw, e2eRowsRaw, pageIdsRaw, dmWithinRaw,
      pkgPairsRaw, conceptMembersRaw)))
    val nested0 = planned(0)
    val instanceIds = planned(1)
    val fnNodes0 = planned(2)
    val epIds = planned(3)
    val varNodes = planned(4)
    val e2eRows = planned(5)
    val pageIds = planned(6)
    val dmWithin = planned(7)
    val pkgPairs = planned(8)
    val conceptMembers = planned(9)

    // --- nodes ---------------------------------------------------------
    // Merged mode: Corpus/Conversation/Role rows recompute from the full
    // text-free meta twin (exact — they never read text); Turn rows come
    // from the delta text plus the committed rows of unchanged convs.
    val spine = merged match {
      case None => spineNodes(spark, t, tMeta)
      case Some(m) =>
        spineNodes(spark, t, tMeta)
          .unionByName(m.localNodes.where(col("node_type") === NodeTypes.Turn))
    }

    val toolNodes = mkNodes(tools.select(col("name")).distinct(),
      NodeTypes.Tool, col("name"), lit(""), lit(-1))

    val entityNodes = mkNodes(
      resolvedEntities.select(col("canonical")).distinct(),
      NodeTypes.Entity, col("canonical"), lit(""), lit(-1))

    // B5/B6/D10 typed entity surface: an Instance node per observed alias
    // surface form, kept distinct from the canonical Entity (class analog) —
    // the OF edge below records instance-of (btreemap_graph.rs:238-255)
    val instanceNodes = mkNodes(instanceIds.select(col("name")).distinct(),
      NodeTypes.Instance, col("name"), lit(""), lit(-1))

    // Function date partition key: the nested_var cascade strategy resolves
    // within this (conv-id date segment); surfacing it as meta makes the
    // find_node_by_name_file_and_meta lookup real (graph.rs:199-204)
    def fnMeta(convId: Column) = map(lit("date"), substring(convId, 13, 8))

    // B13 docs attach: a handler definition's docs = nearest preceding user
    // turn (≤2 back); joined onto the Function node's first-definition turn
    // so the node carries its documentation (asg.rs:66-82 NodeData.docs)
    val fnDocs = Mentions.docsAttach(t)

    // function node = first definition turn per (name, conversation)
    // Merged mode: docsAttach (a text scan) runs over the delta only, so the
    // Function NODE branch is delta-scoped and committed rows of unchanged
    // convs merge in verbatim; fnNodes0 itself stays FULL (it feeds the
    // text-free fnFirstDef edge joins below for every conversation).
    val fnNodesComputed = mkNodes(
      merged.fold(fnNodes0)(_ => fnNodes0.join(deltaConvs, Seq("conv_id"), "left_semi"))
        .join(fnDocs, Seq("conv_id", "turn_idx", "name"), "left"),
      NodeTypes.Function, col("name"), col("conv_id"), col("turn_idx"),
      docs = col("docs"), meta = fnMeta(col("conv_id")))
    val fnNodes = merged match {
      case None => fnNodesComputed
      case Some(m) =>
        fnNodesComputed
          .unionByName(m.localNodes.where(col("node_type") === NodeTypes.Function))
    }

    // unverified call targets become stub nodes (D13: file "<unverified>")
    val stubNodes = mkNodes(
      resolvedCalls.where(col("strategy") === "unverified").select(col("name")).distinct(),
      NodeTypes.Function, col("name"), lit("unverified"), lit(-1),
      meta = fnMeta(lit("unverified")))

    // endpoint identity = (canonical path, verb) after D11 dedup + D14 grouping
    val epNodes = mkNodes(epIds, NodeTypes.Endpoint, col("name"), lit(""), lit(-1),
      verb = col("verb"),
      meta = map(lit("verb"), col("verb"),
        lit("group"), regexp_extract(col("name"), "^(/[^/]+/[^/]+)", 1)))

    // Request meta: verb always; nested_in when a handler scope encloses it
    // (map_filter drops the null) — the reference stores both in NodeData
    // meta (asg.rs:144-228)
    val reqNodes = mkNodes(
      requests.join(
        nested0.withColumnRenamed("req_name", "name").withColumnRenamed("fn_name", "nested_fn"),
        Seq("conv_id", "turn_idx", "name"), "left"),
      NodeTypes.Request, col("name"), col("conv_id"), col("turn_idx"),
      meta = map_filter(
        map(lit("verb"), col("verb"), lit("nested_in"), col("nested_fn")),
        (_, v) => v.isNotNull))

    // B14/D12 test nodes as graph citizens (asg.rs:248-274; linker.rs:34-235):
    // an IntegrationTest per rerun-call turn (its CALLS edge resolves through
    // the cascade like any call), an E2eTest per template-path request
    val integTestNodes = mkNodes(
      resolvedCalls.select(col("name"), col("conv_id"), col("turn_idx")),
      NodeTypes.IntegrationTest, col("name"), col("conv_id"), col("turn_idx"),
      meta = map(lit("kind"), lit("integration")))
    val e2eTestNodes = mkNodes(e2eRows, NodeTypes.E2eTest,
      col("name"), col("conv_id"), col("turn_idx"),
      meta = map(lit("kind"), lit("e2e")))

    // B12 pages (get_pages, lang/mod.rs:408-554): the resource surface a
    // user-facing request renders, extracted from the request path
    val pageNodes = mkNodes(pageIds, NodeTypes.Page, col("name"), lit(""), lit(-1))

    // D14 longest-prefix endpoint groups as first-class parent nodes
    // (process_endpoint_groups, btreemap_graph.rs:523-602)
    val groupIds = epIds
      .select(regexp_extract(col("name"), "^(/[^/]+/[^/]+)", 1).as("name"))
      .where(length(col("name")) > 0)
      .distinct()
    val groupNodes = mkNodes(groupIds, NodeTypes.EndpointGroup, col("name"), lit(""), lit(-1))

    // D16 data models as graph citizens (btreemap_graph.rs:643-662 + the
    // Function-CONTAINS-DataModel edges of add_functions): a DataModel per
    // canonical entity contract that appears INSIDE a function's defining
    // turn body — broadcast dictionary substring theta-join over tool turns
    // (the reference scans bodies, not the mention table), then cluster
    // identity via the canonicalization stage
    val dictDf = {
      import spark.implicits._
      graft.extract.Dictionary.aliasToCanonical.toSeq.toDF("alias", "canonical")
    }
    // Pre-cluster hit projection ([[dmHitsProjection]]): recomputed from `t`
    // in full mode; in merged mode the committed projection (plus the
    // caller's delta scan) arrives via the stores — cluster identity is
    // global, so it is applied here in BOTH modes, never persisted.
    val dmNodes = mkNodes(dmWithin.select(col("cluster")).distinct(),
      NodeTypes.DataModel, col("cluster"), lit(""), lit(-1))

    // B6 Class/Trait as distinct node types (completing the reference's
    // 21-variant taxonomy, graphs/mod.rs:30-56): a Class per canonical
    // entity CLUSTER (the code-structure citizen the clustered aliases
    // implement), a Trait per observed dictionary canonical (the contract);
    // Class -IMPLEMENTS-> Trait below mirrors class_includes and
    // Class -OPERAND-> Function mirrors find_function_parent
    // (queries/mod.rs:156-166). Both dimensions are tiny (distinct
    // canonicals), so these branches add no corpus-scale work.
    val classNodes = mkNodes(clusters.select(col("cluster")).distinct(),
      NodeTypes.Class, col("cluster"), lit(""), lit(-1),
      meta = map(lit("kind"), lit("class")))
    val traitNodes = mkNodes(clusters.select(col("canonical")).distinct(),
      NodeTypes.Trait, col("canonical"), lit(""), lit(-1),
      meta = map(lit("kind"), lit("trait")))

    // UnitTest: a call resolved WITHIN its own defining conversation is the
    // unit-local test analog (reference UnitTest variant + TestType::Unit,
    // mod.rs:47-56); integration tests stay the cross-conversation family
    val unitTestNodes = mkNodes(
      resolvedCalls.where(col("strategy") === "same_conv")
        .select(col("name"), col("conv_id"), col("turn_idx")),
      NodeTypes.UnitTest, col("name"), col("conv_id"), col("turn_idx"),
      meta = map(lit("kind"), lit("unit")))

    // Mock: the stand-in for an unverified call target (reference Mock
    // variant; mock inventory mcp/src/graph/queries.ts:173-211) — one per
    // distinct stub name, OF-linked to the stub Function below
    val mockNodes = mkNodes(
      resolvedCalls.where(col("strategy") === "unverified").select(col("name")).distinct(),
      NodeTypes.Mock, col("name"), lit(""), lit(-1),
      meta = map(lit("kind"), lit("mock")))

    // Package: tool-prefix namespace as a first-class node (Package variant,
    // mod.rs:30-56); Corpus -CONTAINS-> Package -CONTAINS-> Tool below
    val packageNodes = mkNodes(pkgPairs.select(col("name")).distinct(),
      NodeTypes.Package, col("name"), lit(""), lit(-1),
      meta = map(lit("kind"), lit("package")))

    // Concept: curated dictionary topic with observed members (Concept
    // variant + Concept-Includes-anything, mod.rs:30-56,83-99)
    val conceptNodes = mkNodes(conceptMembers.select(col("topic")).distinct(),
      NodeTypes.Concept, col("topic"), lit(""), lit(-1),
      meta = map(lit("kind"), lit("concept")))

    // import section: one node per conversation, tools concatenated in turn
    // order (B4 combine_import_sections, builder/utils.rs:158-218)
    val importNodes0 = tMeta
      .where(col("tool").isNotNull)
      .groupBy(col("conv_id"))
      .agg(
        min(col("turn_idx")).as("turn_idx"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("tool")))),
            x => x.getField("tool")
          ),
          "\n"
        ).as("body")
      )
    val importNodes =
      mkNodes(importNodes0, NodeTypes.Import, lit("imports"), col("conv_id"), col("turn_idx"),
        body = col("body"))

    // MERGE semantics (A6) WITHOUT a global dedup exchange: every branch
    // emits key-unique rows by construction (groupBy/distinct inputs, one
    // Turn per (conv, turn_idx)) and branches emit disjoint node_types /
    // key spaces (stubs live under conv "unverified"), so a global
    // dropDuplicates(node_key) is a no-op that would shuffle the entire
    // node table — at bench scale the two dedup exchanges (nodes + edges)
    // were the largest remaining shuffles. The DuckDB oracle builds nodes
    // with NO global dedup either, so parity checks the invariant every
    // round; the write path (SnapshotTable overwrite) supplies MERGE-on-
    // rewrite semantics for incremental runs.
    val nodes = probe("nodes union")(
      Seq(spine, toolNodes, entityNodes, fnNodes, stubNodes, epNodes, reqNodes,
        importNodes, pageNodes, groupNodes, instanceNodes, dmNodes, varNodes,
        integTestNodes, e2eTestNodes, classNodes, traitNodes, unitTestNodes, mockNodes,
        packageNodes, conceptNodes)
        .reduce(_ unionByName _))

    // --- edges ---------------------------------------------------------
    def edgeC(et: Column, src: Column, dst: Column, conf: Column = nullConf,
        strat: Column = lit("spine")): Seq[Column] =
      Seq(et.as("edge_type"), src.as("src_key"), dst.as("dst_key"),
        conf.cast("double").as("confidence"), strat.as("strategy"))
    def edge(et: String, src: Column, dst: Column, conf: Column = nullConf,
        strat: Column = lit("spine")): Seq[Column] =
      edgeC(lit(et), src, dst, conf, strat)

    // D13 USES-for-external split (btreemap_graph.rs:429-450): a verified
    // call target gets CALLS; an unverified stub target gets USES (the
    // reference's Edge::uses for external/unresolved referents)
    def callEdgeType: Column =
      when(col("strategy") === "unverified", lit(EdgeTypes.Uses)).otherwise(lit(EdgeTypes.Calls))

    val corpusKey = Keys.nodeKey(lit(NodeTypes.Corpus), lit("corpus"), lit(""), lit(-1))
    def convKey(c: Column) = Keys.nodeKey(lit(NodeTypes.Conversation), c, c, lit(-1))
    def turnKey(c: Column, i: Column) =
      Keys.nodeKey(lit(NodeTypes.Turn), concat(lit("turn-"), i.cast("string")), c, i)
    def roleKey(r: Column) = Keys.nodeKey(lit(NodeTypes.Role), r, lit(""), lit(-1))
    def toolKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Tool), n, lit(""), lit(-1))
    def entityKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Entity), n, lit(""), lit(-1))
    def fnKey(n: Column, c: Column, i: Column) = Keys.nodeKey(lit(NodeTypes.Function), n, c, i)
    def epKey(n: Column, v: Column) =
      Keys.nodeKeyWithVerb(lit(NodeTypes.Endpoint), n, lit(""), lit(-1), v)
    def reqKey(n: Column, c: Column, i: Column) = Keys.nodeKey(lit(NodeTypes.Request), n, c, i)
    def pageKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Page), n, lit(""), lit(-1))
    def groupKey(n: Column) = Keys.nodeKey(lit(NodeTypes.EndpointGroup), n, lit(""), lit(-1))
    def instKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Instance), n, lit(""), lit(-1))
    def dmKey(n: Column) = Keys.nodeKey(lit(NodeTypes.DataModel), n, lit(""), lit(-1))
    def varKey(n: Column, c: Column, i: Column) = Keys.nodeKey(lit(NodeTypes.Var), n, c, i)
    def itestKey(n: Column, c: Column, i: Column) =
      Keys.nodeKey(lit(NodeTypes.IntegrationTest), n, c, i)
    def e2eKey(n: Column, c: Column, i: Column) = Keys.nodeKey(lit(NodeTypes.E2eTest), n, c, i)
    def classKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Class), n, lit(""), lit(-1))
    def traitKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Trait), n, lit(""), lit(-1))
    def utestKey(n: Column, c: Column, i: Column) = Keys.nodeKey(lit(NodeTypes.UnitTest), n, c, i)
    def mockKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Mock), n, lit(""), lit(-1))
    def pkgKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Package), n, lit(""), lit(-1))
    def conceptKey(n: Column) = Keys.nodeKey(lit(NodeTypes.Concept), n, lit(""), lit(-1))

    val containsConv = tMeta.select(col("conv_id")).distinct()
      .select(edge(EdgeTypes.Contains, corpusKey, convKey(col("conv_id"))): _*)
    val containsTurn = tMeta
      .select(edge(EdgeTypes.Contains, convKey(col("conv_id")),
        turnKey(col("conv_id"), col("turn_idx"))): _*)
    val ofRole = tMeta
      .select(edge(EdgeTypes.Of, turnKey(col("conv_id"), col("turn_idx")),
        roleKey(col("role"))): _*)
    val usesTool = tMeta
      .where(col("tool").isNotNull)
      .select(edge(EdgeTypes.Uses, turnKey(col("conv_id"), col("turn_idx")),
        toolKey(col("tool")), strat = lit("tool_column")): _*)
    // pre-key dedup on compact natural columns (a turn re-mentioning the
    // same canonical entity emits one edge) — dedup BEFORE key strings are
    // built, so the exchange moves 4 small columns, not 2 long keys
    val mentionsE = resolvedEntities
      .select("conv_id", "turn_idx", "canonical", "confidence", "strategy")
      .distinct()
      .select(edge(EdgeTypes.Mentions, turnKey(col("conv_id"), col("turn_idx")),
        entityKey(col("canonical")), col("confidence"), col("strategy")): _*)

    // CALLS: calling turn -> resolved function node (first def turn in the
    // resolved conversation) or unverified stub (D13 semantics). The join is
    // on resolved_name: the operand strategy can retarget a call to a
    // sibling handler of the same canonical entity.
    val fnFirstDef = fnNodes0.select(col("name"), col("conv_id").as("resolved_conv"),
      col("turn_idx").as("def_turn"))
    // 2 consumers (turn-src + test-src edges): share the resolved-target join
    val resolvedTargets = probe("resolvedTargets lcp")(resolvedCalls
      .join(
        fnFirstDef.withColumnRenamed("name", "resolved_name"),
        Seq("resolved_name", "resolved_conv"),
        "left")
      .withColumn(
        "target_key",
        when(col("def_turn").isNull, fnKey(col("name"), lit("unverified"), lit(-1)))
          .otherwise(fnKey(col("resolved_name"), col("resolved_conv"), col("def_turn"))))
      .lcp(eager = false))
    val callsFn = resolvedTargets
      .select(edgeC(
        callEdgeType,
        turnKey(col("conv_id"), col("turn_idx")),
        col("target_key"),
        col("confidence"), col("strategy")): _*)

    // B14/D12 test-CALLS edges: the IntegrationTest node of each rerun turn
    // calls its cascade-resolved target (linker.rs:34-211); same D13 split
    val testCallsE = resolvedTargets
      .select(edgeC(
        callEdgeType,
        itestKey(col("name"), col("conv_id"), col("turn_idx")),
        col("target_key"),
        col("confidence"), col("strategy")): _*)

    // E5 analog: an E2eTest exercises the Page surface its template path
    // names (linker.rs:213-235)
    val e2eCallsE = e2eRows
      .select(edge(EdgeTypes.Calls,
        e2eKey(col("name"), col("conv_id"), col("turn_idx")),
        pageKey(col("res")), strat = lit("e2e_page")): _*)

    // D10 instance-of: observed alias -OF-> canonical Entity cluster
    // (Edge::of, btreemap_graph.rs:250)
    val ofInstanceE = instanceIds
      .select(edge(EdgeTypes.Of, instKey(col("name")), entityKey(col("canonical")),
        strat = lit("instance_of")): _*)

    // D16: defining function -CONTAINS-> the DataModel contracts in its body
    val dmContainsE = dmWithin
      .join(
        fnFirstDef
          .withColumnRenamed("resolved_conv", "conv_id")
          .withColumnRenamed("name", "fn_name"),
        Seq("fn_name", "conv_id"))
      .select(edge(EdgeTypes.Contains,
        fnKey(col("fn_name"), col("conv_id"), col("def_turn")),
        dmKey(col("cluster")), strat = lit("data_model")): _*)

    // B5: turn -CONTAINS-> its Var binding (from the Var NODE frame, which
    // in merged mode already spans committed + delta conversations)
    val varContainsE = varNodes
      .select(edge(EdgeTypes.Contains,
        turnKey(col("conv_id"), col("turn_idx")),
        varKey(col("name"), col("conv_id"), col("turn_idx")),
        strat = lit("var_decl")): _*)

    // HANDLER: endpoint identity -> handler function of the declaring turn.
    // Dedup PRE-key on the compact natural columns (same rationale as
    // mentionsE): (ep, verb, fn, conv) is the full edge identity once joined
    // to the unique first-def turn, so the distinct's exchange moves 4 short
    // columns instead of two built key strings.
    val handlerE = endpoints
      .select(
        PathNorm.canonical(PathNorm.normalizeBackend(col("path"))).as("ep_name"),
        col("verb"), col("conv_id"), col("turn_idx"))
      .join(
        fnDefs.select(col("conv_id"), col("turn_idx"), col("name").as("fn_name")),
        Seq("conv_id", "turn_idx"))
      .select("ep_name", "verb", "fn_name", "conv_id")
      .distinct()
      .join(fnFirstDef.withColumnRenamed("resolved_conv", "conv_id")
          .withColumnRenamed("name", "fn_name"), Seq("fn_name", "conv_id"))
      .select(edge(EdgeTypes.Handler, epKey(col("ep_name"), col("verb")),
        fnKey(col("fn_name"), col("conv_id"), col("def_turn")),
        strat = lit("handler")): _*)

    // D9 analog: the turn owning a Request gets CALLS(turn -> request),
    // as the reference emits CALLS(fn -> request) (btreemap_graph.rs:257-313)
    val callsReq = requests
      .select(edge(EdgeTypes.Calls, turnKey(col("conv_id"), col("turn_idx")),
        reqKey(col("name"), col("conv_id"), col("turn_idx")),
        strat = lit("request_in_turn")): _*)

    val callsApi = apiLinks
      .select(edge(EdgeTypes.Calls,
        reqKey(col("req_path"), col("conv_id"), col("turn_idx")),
        epKey(col("norm_path"), col("verb")), strat = lit("api_link")): _*)

    // B15 collect_import_edges analog: the per-conversation Import section
    // node -IMPORTS-> each Tool it names (parse/collect.rs:424-581)
    def importKey(c: Column, i: Column) =
      Keys.nodeKey(lit(NodeTypes.Import), lit("imports"), c, i)
    // sourced from the text-free meta twin (NOT `t`): identical columns in
    // full mode, and in merged mode the twin spans the whole corpus while
    // `t` carries only the delta
    val importsE = tMeta
      .where(col("tool").isNotNull)
      .select(col("conv_id"), col("tool"))
      .distinct()
      .join(importNodes0.select(col("conv_id"), col("turn_idx")), Seq("conv_id"))
      .select(edge(EdgeTypes.Imports, importKey(col("conv_id"), col("turn_idx")),
        toolKey(col("tool")), strat = lit("import_section")): _*)

    // C5 find_function_parent analog (method -> owning Class operand edge,
    // queries/mod.rs:156-166): the service Tool owns the handler Function
    // its turns define
    val operandE = fnDefs
      .select(col("conv_id"), col("turn_idx"), col("name").as("fn_name"))
      .join(
        tMeta.where(col("tool").isNotNull).select(col("conv_id"), col("turn_idx"), col("tool")),
        Seq("conv_id", "turn_idx"))
      .join(
        fnFirstDef
          .withColumnRenamed("resolved_conv", "conv_id")
          .withColumnRenamed("name", "fn_name"),
        Seq("fn_name", "conv_id"))
      .select(edge(EdgeTypes.Operand, toolKey(col("tool")),
        fnKey(col("fn_name"), col("conv_id"), col("def_turn")),
        strat = lit("tool_owner")): _*)
      .distinct()

    // D15 class_inherits analog: longest-prefix group -PARENT_OF-> endpoint
    val parentOfE = epIds
      .withColumn("grp", regexp_extract(col("name"), "^(/[^/]+/[^/]+)", 1))
      .where(length(col("grp")) > 0)
      .select(edge(EdgeTypes.ParentOf, groupKey(col("grp")), epKey(col("name"), col("verb")),
        strat = lit("endpoint_group")): _*)

    // B12 renders: page -RENDERS-> the endpoints serving its resource
    val rendersE = epIds
      .withColumn("res", regexp_extract(col("name"), "^/api/([a-z]+)", 1))
      .join(pageIds.withColumnRenamed("name", "res"), Seq("res"))
      .select(edge(EdgeTypes.Renders, pageKey(col("res")), epKey(col("name"), col("verb")),
        strat = lit("renders")): _*)

    // B7/D15 implements: a handler function -IMPLEMENTS-> the canonical
    // entity contract its name is derived from (trait analog); targets use
    // the post-canonicalization cluster identity
    val implementsE = fnNodes0
      .withColumn("alias", regexp_replace(col("name"), "_handler$", ""))
      .join(broadcast(dictDf), Seq("alias"))
      .join(broadcast(clusters), Seq("canonical"))
      .select(edge(EdgeTypes.Implements, fnKey(col("name"), col("conv_id"), col("turn_idx")),
        entityKey(col("cluster")), strat = lit("implements")): _*)

    // Class -OPERAND-> its method Functions (find_function_parent analog:
    // the handler's owning class is the canonical cluster its name derives
    // from); one row per (fn name, conv) — unique by fnNodes0 grouping
    val classMethodE = fnNodes0
      .withColumn("alias", regexp_replace(col("name"), "_handler$", ""))
      .join(broadcast(dictDf), Seq("alias"))
      .join(broadcast(clusters), Seq("canonical"))
      .select(edge(EdgeTypes.Operand, classKey(col("cluster")),
        fnKey(col("name"), col("conv_id"), col("turn_idx")),
        strat = lit("class_method")): _*)

    // Class -IMPLEMENTS-> Trait (class_includes analog): one row per
    // observed canonical in the cluster dimension
    val classImplE = clusters
      .select(edge(EdgeTypes.Implements, classKey(col("cluster")), traitKey(col("canonical")),
        strat = lit("class_includes")): _*)

    // UnitTest -CALLS-> its same-conversation target (TestType::Unit)
    val unitCallsE = resolvedTargets
      .where(col("strategy") === "same_conv")
      .select(edgeC(lit(EdgeTypes.Calls),
        utestKey(col("name"), col("conv_id"), col("turn_idx")),
        col("target_key"),
        col("confidence"), col("strategy")): _*)

    // Mock -OF-> the unverified stub Function it stands in for
    val mockOfE = resolvedCalls
      .where(col("strategy") === "unverified")
      .select(col("name")).distinct()
      .select(edge(EdgeTypes.Of, mockKey(col("name")),
        fnKey(col("name"), lit("unverified"), lit(-1)), strat = lit("mock_of")): _*)

    // NESTED_IN edges from the nested0 range join computed in the node
    // section (it also feeds Request meta)
    val nestedInE = nested0
      .join(
        fnFirstDef
          .withColumnRenamed("resolved_conv", "conv_id")
          .withColumnRenamed("name", "fn_name"),
        Seq("fn_name", "conv_id"))
      .select(edge(EdgeTypes.NestedIn, reqKey(col("req_name"), col("conv_id"), col("turn_idx")),
        fnKey(col("fn_name"), col("conv_id"), col("def_turn")), strat = lit("nested_scope")): _*)

    // Corpus -CONTAINS-> Package -CONTAINS-> Tool: the package namespace
    // spine (reference Package containment); both branches unique by the
    // distinct'd (prefix, tool) dimension
    val pkgCorpusE = pkgPairs
      .select(col("name")).distinct()
      .select(edge(EdgeTypes.Contains, corpusKey, pkgKey(col("name")),
        strat = lit("corpus_package")): _*)
    val pkgToolE = pkgPairs
      .select(edge(EdgeTypes.Contains, pkgKey(col("name")), toolKey(col("tool")),
        strat = lit("package_tool")): _*)

    // Concept -INCLUDES-> member Entity cluster (mod.rs:83-99)
    val includesE = conceptMembers
      .select(edge(EdgeTypes.Includes, conceptKey(col("topic")), entityKey(col("cluster")),
        strat = lit("concept_includes")): _*)

    val edges = Seq(containsConv, containsTurn, ofRole, usesTool, mentionsE, callsFn, handlerE)
      .reduce(_ unionByName _)
      .unionByName(callsReq)
      .unionByName(callsApi)
      .unionByName(importsE)
      .unionByName(operandE)
      .unionByName(parentOfE)
      .unionByName(rendersE)
      .unionByName(implementsE)
      .unionByName(nestedInE)
      .unionByName(testCallsE)
      .unionByName(e2eCallsE)
      .unionByName(ofInstanceE)
      .unionByName(dmContainsE)
      .unionByName(varContainsE)
      .unionByName(classMethodE)
      .unionByName(classImplE)
      .unionByName(unitCallsE)
      .unionByName(mockOfE)
      .unionByName(pkgCorpusE)
      .unionByName(pkgToolE)
      .unionByName(includesE)
    // sorted-set dedup (D1) is PER-BRANCH, pre-key, on compact natural
    // columns (mentionsE below; handlerE/operandE carry their own distinct;
    // every other branch is unique by construction: ≤1 handler/verb-path
    // mention per turn, distinct'd dimension inputs). A global distinct()
    // would re-shuffle all ~N_edges wide rows to eliminate nothing — the
    // oracle's SELECT DISTINCT edges proves the no-dup invariant each round.

    probe(f"node/edge construction section (${(System.nanoTime() - sectionT0) / 1e9}%.2f s actual)")(())
    Graph(nodes, edges, mentions)
  }
}
