package graft.schema

import java.sql.Timestamp

/** Core row types of the KG-construction engine.
  *
  * Re-expression of the reference's data model (see SURVEY.md §1):
  *  - NodeData / NodeType  -> [[NodeRow]]   (ast/src/lang/asg.rs:66-82, graphs/mod.rs:30-56)
  *  - Edge / EdgeType      -> [[EdgeRow]]   (ast/src/lang/graphs/mod.rs:70-99)
  *  - Calls candidate      -> [[TripleRow]] (ast/src/lang/asg.rs:237-246 — the
  *    (subj, pred, obj) candidate with confidence + strategy provenance)
  * over an Iceberg-shaped transcript corpus (conv_id, turn_idx, role, text, tool, ts)
  * instead of source files: a document = conversation, a line = turn.
  */
final case class TurnRow(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp
)

/** A detected mention of a (possible) entity inside one turn.
  * Analog of the reference's per-file extraction records (NodeData before
  * resolution) — provenance is (conv_id, turn_idx) instead of (file, start).
  */
final case class MentionRow(
    conv_id: String,
    turn_idx: Int,
    mention_type: String, // Entity | Function | Endpoint | Request | Tool
    name: String,
    verb: Option[String], // Endpoint/Request only (asg.rs:144-147 meta.verb)
    path: Option[String]  // Endpoint/Request only
)

/** Materialized graph node. node_key is the canonical string identity
  * (ast/src/utils.rs:82-136 create_node_key); ref_id = sha2(node_key) for
  * determinism (replacing the reference's UUID v4, graphs/mod.rs:131).
  */
final case class NodeRow(
    node_type: String,
    name: String,
    conv_id: String, // "file" provenance; empty for corpus-level nodes
    turn_idx: Int,   // "start" provenance; -1 for conv/corpus-level nodes
    body: String,
    node_key: String,
    ref_id: String,
    docs: Option[String],    // NodeData.docs (asg.rs:66-82): attached comments
    meta: Map[String, String] // NodeData meta bag (asg.rs:144-228): verb/group/role/…
)

/** Materialized graph edge = the (subj, pred, obj) output triple.
  * confidence + strategy mirror the reference's Calls provenance
  * (asg.rs:237-246; persisted on Neo4j edges at neo4j/operations/batch.rs:158-160).
  */
final case class EdgeRow(
    edge_type: String,
    src_key: String,
    dst_key: String,
    confidence: Double,
    strategy: String
)

/** Pre-materialization (subj, pred, obj) candidate, keyed by names not keys. */
final case class TripleRow(
    conv_id: String,
    turn_idx: Int,
    subj: String,
    pred: String,
    obj: String,
    confidence: Double,
    strategy: String
)

/** Per-stage, per-partition lineage row (the checkpoint/resume unit).
  * Analog of the reference's per-stage streaming flush watermarks
  * (ast/src/builder/streaming.rs:95-130) + stage timing logs
  * (ast/src/builder/utils.rs:235-243).
  */
final case class LineageRow(
    run_id: String,
    stage: String,
    partition_key: String,
    row_count: Long,
    wall_ms: Long,
    committed_at: Timestamp
)

object NodeTypes {
  // Transcript-domain re-expression of the reference's 21 NodeType variants
  // (ast/src/lang/graphs/mod.rs:30-56); see SURVEY.md §7.1 for the mapping.
  val Corpus = "Corpus"             // Repository
  val Conversation = "Conversation" // Directory/File containment spine
  val Turn = "Turn"                 // source line range
  val Role = "Role"                 // Language
  val Entity = "Entity"             // Class/DataModel/Var mentions
  val Function = "Function"         // Function (handler names)
  val Endpoint = "Endpoint"
  val Request = "Request"
  val Tool = "Tool"                 // Library
  val Import = "Import"             // per-conv header section
  val Page = "Page"                 // Page (resource surface users request)
  val EndpointGroup = "EndpointGroup" // D14 longest-prefix group parent
  val Instance = "Instance"         // Instance (observed alias surface form; OF -> Entity)
  val DataModel = "DataModel"       // DataModel (entity contract a function body touches)
  val Var = "Var"                   // Var (per-turn returned value binding, B5 get_vars)
  val IntegrationTest = "IntegrationTest" // asg.rs:248-274 test taxonomy
  val E2eTest = "E2etest"           // reference spells the variant "E2etest" (mod.rs:328)
  val Class = "Class"               // Class (canonical entity cluster as code structure)
  val Trait = "Trait"               // Trait (dictionary contract a Class implements)
  val UnitTest = "UnitTest"         // UnitTest (same-conversation-resolved call)
  val Mock = "Mock"                 // Mock (stand-in for an unverified call target)
  val Package = "Package"           // Package (tool-prefix namespace, mod.rs:30-56)
  val Concept = "Concept"           // Concept (curated topic; Includes -> members, mod.rs:83-99)
  val all: Seq[String] =
    Seq(Corpus, Conversation, Turn, Role, Entity, Function, Endpoint, Request, Tool, Import,
      Page, EndpointGroup, Instance, DataModel, Var, IntegrationTest, E2eTest,
      Class, Trait, UnitTest, Mock, Package, Concept)
}

object EdgeTypes {
  // Reference EdgeType variants kept under their own names
  // (ast/src/lang/graphs/mod.rs:83-99).
  val Contains = "CONTAINS"
  val Of = "OF"
  val Calls = "CALLS"
  val Uses = "USES"
  val Handler = "HANDLER"
  val Mentions = "MENTIONS" // transcript-domain addition: turn -> entity
  val Imports = "IMPORTS"
  val Operand = "OPERAND"
  val Renders = "RENDERS"
  val ParentOf = "PARENT_OF"
  val Implements = "IMPLEMENTS"
  val NestedIn = "NESTED_IN"
  val Includes = "INCLUDES" // Concept -Includes-> member entity (mod.rs:83-99)
}
