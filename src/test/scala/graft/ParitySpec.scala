package graft

import java.util.regex.Pattern
import graft.extract.Dictionary

/** Triple-set parity (the BASELINE.json headline gate): the pipeline's
  * (subj, pred, obj) edge set must match a SEALED, independent reference
  * extractor at precision/recall >= 0.95.
  *
  * The reference implementation below is deliberately plain single-threaded
  * Scala over collected rows — regex scans, hash maps, loops — sharing NO
  * Spark code with the engine (only the Dictionary constants, which are
  * configuration). It mirrors the reference system's per-file imperative
  * extraction (ast/src/lang/parse/collect.rs; call_finder.rs cascade;
  * linker.rs path matching) re-keyed to transcripts.
  */
class ParitySpec extends SparkSpec {

  private def san(s: String): String = s.toLowerCase.replaceAll("[^a-zA-Z0-9]", "")
  private def key4(t: String, n: String, c: String, i: Int): String =
    Seq(san(t), san(n), san(c), san(i.toString)).mkString("-")
  private def key5(t: String, n: String, c: String, i: Int, v: String): String =
    key4(t, n, c, i) + "-" + san(v)

  private def normBackend(p: String): String = {
    var x = p.replaceAll("\\{[^}]*\\}", ":param")
    x = x.replaceAll("/[0-9]+(?=/|$)", "/:param")
    if (x != "/") x.replaceAll("/+$", "") else x
  }
  private def normFrontend(p: String): String = {
    var x = p.replaceAll("^https?://[^/]+", "")
    x = x.replaceAll("\\$\\{[^}]*\\}", ":param")
    x = x.replaceAll("/[0-9]+(?=/|$)", "/:param")
    if (x != "/") x.replaceAll("/+$", "") else x
  }

  case class T(conv: String, idx: Int, role: String, text: String, tool: Option[String])
  case class Triple(et: String, src: String, dst: String, conf: Double, strat: String)

  /** The sealed reference extractor: transcripts -> expected triple set. */
  private def referenceTriples(rows: Seq[T]): Set[Triple] = {
    val aliasRe = Pattern.compile(Dictionary.aliasPattern)
    val handlerRe = Pattern.compile(Dictionary.handlerPattern)
    val vpRe = Pattern.compile(Dictionary.verbPathPattern)
    val dict = Dictionary.aliasToCanonical

    def turnKey(c: String, i: Int) = key4("Turn", s"turn-$i", c, i)

    val out = scala.collection.mutable.Set[Triple]()
    val corpusKey = key4("Corpus", "corpus", "", -1)

    // spine
    rows.map(_.conv).distinct.foreach { c =>
      out += Triple("CONTAINS", corpusKey, key4("Conversation", c, c, -1), 1.0, "spine")
    }
    rows.foreach { r =>
      out += Triple("CONTAINS", key4("Conversation", r.conv, r.conv, -1),
        turnKey(r.conv, r.idx), 1.0, "spine")
      out += Triple("OF", turnKey(r.conv, r.idx), key4("Role", r.role, "", -1), 1.0, "spine")
      r.tool.foreach { tl =>
        out += Triple("USES", turnKey(r.conv, r.idx), key4("Tool", tl, "", -1), 1.0, "tool_column")
      }
    }

    // entity mentions -> MENTIONS, with cluster canonicalization: near-dup
    // canonical ids (char-3-gram Jaccard >= 0.3) merge to the component min.
    // Deliberately all-pairs + union-find here (no LSH) — if the engine's
    // LSH blocking ever misses a true pair, parity catches it.
    val entityMentions = scala.collection.mutable.ListBuffer[(String, String)]()
    val aliasOf = scala.collection.mutable.Set[(String, String)]() // (alias surface, canonical)
    rows.foreach { r =>
      val m = aliasRe.matcher(r.text)
      while (m.find()) {
        dict.get(m.group(1)).foreach { c =>
          entityMentions += ((turnKey(r.conv, r.idx), c))
          aliasOf += ((m.group(1), c))
        }
      }
    }
    val present = entityMentions.map(_._2).toSet
    def sh3(s: String): Set[String] =
      if (s.length >= 3) (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet
      else Set.empty
    val parent = scala.collection.mutable.Map[String, String](present.map(c => c -> c).toSeq: _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- present; b <- present if a < b) {
      val (sa, sb) = (sh3(a.toLowerCase), sh3(b.toLowerCase))
      if (sa.nonEmpty && sb.nonEmpty) {
        val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if (j >= 0.3) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
            parent(hi) = lo
          }
        }
      }
    }
    val clusterOf: Map[String, String] =
      present.groupBy(find).flatMap { case (_, grp) =>
        val m = grp.min; grp.map(_ -> m)
      }
    entityMentions.foreach { case (tk, c) =>
      out += Triple("MENTIONS", tk, key4("Entity", clusterOf(c), "", -1), 1.0, "alias_dict")
    }

    // function defs / calls
    case class FnMention(conv: String, idx: Int, name: String, isDef: Boolean)
    val fns = rows.flatMap { r =>
      val m = handlerRe.matcher(r.text)
      if (m.find()) Some(FnMention(r.conv, r.idx, m.group(1), r.role == "tool")) else None
    }
    val defs = fns.filter(_.isDef)
    val defConvs: Map[String, Set[String]] =
      defs.groupBy(_.name).map { case (n, ms) => n -> ms.map(_.conv).toSet }
    val firstDefTurn: Map[(String, String), Int] =
      defs.groupBy(m => (m.name, m.conv)).map { case (k, ms) => k -> ms.map(_.idx).min }

    // 7-strategy cascade (call_finder.rs:41-128 order and confidences)
    val toolAt0: Map[(String, Int), String] =
      rows.collect { case r if r.tool.isDefined => (r.conv, r.idx) -> r.tool.get }.toMap
    val convTools: Map[String, Set[String]] =
      rows.filter(_.tool.isDefined).groupBy(_.conv).map { case (c, rs) =>
        c -> rs.map(_.tool.get).toSet
      }
    // def name -> set of (tool of its defining turn, def conv)
    val defToolConvs: Map[String, Set[(String, String)]] =
      defs.flatMap(d => toolAt0.get((d.conv, d.idx)).map(tl => (d.name, tl, d.conv)))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(x => (x._2, x._3)).toSet }
    // canonical entity -> lexicographically smallest (def conv, def name)
    val canonDefs: Map[String, (String, String)] = defs
      .flatMap { d =>
        dict.get(d.name.replaceAll("_handler$", "")).map(c => c -> (d.conv, d.name))
      }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }

    fns.filter(!_.isDef).foreach { c =>
      val convs = defConvs.getOrElse(c.name, Set.empty)
      val imported = defToolConvs
        .getOrElse(c.name, Set.empty)
        .collect { case (tl, dc) if convTools.getOrElse(c.conv, Set.empty).contains(tl) => dc }
      val operandHit = dict.get(c.name.replaceAll("_handler$", "")).flatMap(canonDefs.get)
      val sameDate = convs.filter(_.substring(12, 20) == c.conv.substring(12, 20))
      val sameUser = convs.filter(_.startsWith(c.conv.substring(0, 11)))
      val (resolvedConv, resolvedName, conf, strat) =
        if (convs.size == 1) (convs.head, c.name, 0.90, "global_unique")
        else if (convs.contains(c.conv)) (c.conv, c.name, 0.85, "same_conv")
        else if (imported.nonEmpty) (imported.min, c.name, 0.80, "import")
        else if (operandHit.isDefined)
          (operandHit.get._1, operandHit.get._2, 0.70, "operand")
        else if (sameDate.nonEmpty) (sameDate.min, c.name, 0.60, "nested_var")
        else if (sameUser.nonEmpty) (sameUser.min, c.name, 0.45, "same_dir")
        else ("unverified", c.name, 0.35, "unverified")
      val dst =
        if (resolvedConv == "unverified") key4("Function", c.name, "unverified", -1)
        else key4("Function", resolvedName, resolvedConv,
          firstDefTurn((resolvedName, resolvedConv)))
      // D13 USES-for-external split: unverified stub targets get USES
      val et = if (strat == "unverified") "USES" else "CALLS"
      out += Triple(et, turnKey(c.conv, c.idx), dst, conf, strat)
      // B14/D12: the IntegrationTest citizen of each call turn calls the
      // same cascade-resolved target
      out += Triple(et, key4("IntegrationTest", c.name, c.conv, c.idx), dst, conf, strat)
    }

    // endpoints / requests
    case class Vp(conv: String, idx: Int, verb: String, path: String, isEp: Boolean)
    val vps = rows.filter(r => r.role == "tool" || r.role == "assistant").flatMap { r =>
      val m = vpRe.matcher(r.text)
      if (m.find()) Some(Vp(r.conv, r.idx, m.group(1), m.group(2), r.role == "tool")) else None
    }
    val eps = vps.filter(_.isEp)
    val epIds = eps.map(e => (normBackend(e.path), e.verb)).toSet

    // HANDLER: endpoint identity -> handler function declared in same turn
    eps.foreach { e =>
      fns.filter(f => f.isDef && f.conv == e.conv && f.idx == e.idx).foreach { f =>
        out += Triple("HANDLER", key5("Endpoint", normBackend(e.path), "", -1, e.verb),
          key4("Function", f.name, f.conv, firstDefTurn((f.name, f.conv))), 1.0, "handler")
      }
    }

    vps.filter(!_.isEp).foreach { q =>
      out += Triple("CALLS", turnKey(q.conv, q.idx),
        key4("Request", q.path, q.conv, q.idx), 1.0, "request_in_turn")
      val np = normFrontend(q.path)
      if (epIds.contains((np, q.verb))) {
        out += Triple("CALLS", key4("Request", q.path, q.conv, q.idx),
          key5("Endpoint", np, "", -1, q.verb), 1.0, "api_link")
      }
    }

    // import-section edges: the conversation's Import node (anchored at its
    // first tool turn) -IMPORTS-> every tool it names
    rows.groupBy(_.conv).foreach { case (c, rs) =>
      val toolRows = rs.filter(_.tool.isDefined)
      if (toolRows.nonEmpty) {
        val minIdx = toolRows.map(_.idx).min
        toolRows.map(_.tool.get).distinct.foreach { tl =>
          out += Triple("IMPORTS", key4("Import", "imports", c, minIdx),
            key4("Tool", tl, "", -1), 1.0, "import_section")
        }
      }
    }

    // operand edges: the service Tool owns the handler Function its turns
    // define (first-definition node per (name, conv))
    val toolAt: Map[(String, Int), String] =
      rows.collect { case r if r.tool.isDefined => (r.conv, r.idx) -> r.tool.get }.toMap
    defs.foreach { f =>
      toolAt.get((f.conv, f.idx)).foreach { tl =>
        out += Triple("OPERAND", key4("Tool", tl, "", -1),
          key4("Function", f.name, f.conv, firstDefTurn((f.name, f.conv))), 1.0, "tool_owner")
      }
    }

    // endpoint-group PARENT_OF + page RENDERS + function IMPLEMENTS +
    // request NESTED_IN (range containment) — the D15/B12/B7/B9 families
    val grpRe = Pattern.compile("^(/[^/]+/[^/]+)")
    val resRe = Pattern.compile("^/api/([a-z]+)")
    def extract1(p: Pattern, s: String): Option[String] = {
      val m = p.matcher(s); if (m.find()) Some(m.group(1)) else None
    }
    epIds.foreach { case (np, verb) =>
      extract1(grpRe, np).foreach { g =>
        out += Triple("PARENT_OF", key4("EndpointGroup", g, "", -1),
          key5("Endpoint", np, "", -1, verb), 1.0, "endpoint_group")
      }
    }
    val pageNames = vps.filter(!_.isEp).flatMap(q => extract1(resRe, q.path)).toSet
    epIds.foreach { case (np, verb) =>
      extract1(resRe, np).filter(pageNames.contains).foreach { res =>
        out += Triple("RENDERS", key4("Page", res, "", -1),
          key5("Endpoint", np, "", -1, verb), 1.0, "renders")
      }
    }
    defs.groupBy(m => (m.name, m.conv)).keys.foreach { case (n, c) =>
      dict.get(n.replaceAll("_handler$", "")).foreach { canon =>
        clusterOf.get(canon).foreach { cl =>
          out += Triple("IMPLEMENTS", key4("Function", n, c, firstDefTurn((n, c))),
            key4("Entity", cl, "", -1), 1.0, "implements")
        }
      }
    }
    vps.filter(!_.isEp).foreach { q =>
      val cands = defs.filter(d => d.conv == q.conv && d.idx < q.idx && q.idx <= d.idx + 5)
      if (cands.nonEmpty) {
        val best = cands.maxBy(d => (d.idx, d.name))
        out += Triple("NESTED_IN", key4("Request", q.path, q.conv, q.idx),
          key4("Function", best.name, best.conv, firstDefTurn((best.name, best.conv))),
          1.0, "nested_scope")
      }
    }

    // D10 instance-of: every observed alias surface -OF-> its canonical
    // Entity cluster
    aliasOf.foreach { case (alias, c) =>
      out += Triple("OF", key4("Instance", alias, "", -1),
        key4("Entity", clusterOf(c), "", -1), 1.0, "instance_of")
    }

    // E2e tests: a template-path request is an E2etest exercising the Page
    // surface its path names
    vps.filter(q => !q.isEp && q.path.contains("${id}")).foreach { q =>
      val res = extract1(resRe, q.path).getOrElse("")
      out += Triple("CALLS", key4("E2etest", q.path, q.conv, q.idx),
        key4("Page", res, "", -1), 1.0, "e2e_page")
    }

    // B5 vars: the returned-value binding of a turn, contained by its turn
    val varRe = Pattern.compile("returned ([0-9]+)")
    rows.foreach { r =>
      val m = varRe.matcher(r.text)
      if (m.find()) {
        out += Triple("CONTAINS", turnKey(r.conv, r.idx),
          key4("Var", m.group(1), r.conv, r.idx), 1.0, "var_decl")
      }
    }

    // D16 data models: a defining tool turn's body that names a dictionary
    // alias CONTAINS that entity contract (substring scan, like the engine's
    // instr theta-join; cluster identity from canonicalization)
    rows.filter(_.role == "tool").foreach { r =>
      val m = handlerRe.matcher(r.text)
      if (m.find()) {
        val fn = m.group(1)
        dict.foreach { case (alias, canonical) =>
          if (r.text.contains(alias)) clusterOf.get(canonical).foreach { cl =>
            out += Triple("CONTAINS", key4("Function", fn, r.conv, firstDefTurn((fn, r.conv))),
              key4("DataModel", cl, "", -1), 1.0, "data_model")
          }
        }
      }
    }
    out.toSet
  }

  test("triple-set P/R >= 0.95 vs sealed reference extractor (sf0.001)") {
    import spark.implicits._
    val rows = SparkTestSession.transcripts
      .select("conv_id", "turn_idx", "role", "text", "tool")
      .as[(String, Int, String, String, Option[String])]
      .collect()
      .map(r => T(r._1, r._2, r._3, r._4, r._5))
      .toSeq

    val gold = referenceTriples(rows)
    val got = SparkTestSession.graph.edges
      .select("edge_type", "src_key", "dst_key", "confidence", "strategy")
      .as[(String, String, String, Double, String)]
      .collect()
      .map(e => Triple(e._1, e._2, e._3, e._4, e._5))
      .toSet

    val inter = gold.intersect(got).size.toDouble
    val precision = inter / got.size
    val recall = inter / gold.size
    info(f"precision=$precision%.4f recall=$recall%.4f gold=${gold.size} got=${got.size}")
    if (precision < 1.0) {
      info("sample false positives: " + got.diff(gold).take(3).mkString("; "))
    }
    if (recall < 1.0) {
      info("sample misses: " + gold.diff(got).take(3).mkString("; "))
    }
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }
}
