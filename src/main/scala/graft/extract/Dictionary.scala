package graft.extract

/** The entity-alias dictionary — the transcript-domain analog of the
  * reference's per-language type registry + skip lists
  * (ast/src/lang/registry/mod.rs:26-62, ast/src/lang/queries/skips/):
  * a small broadcastable map (alias -> canonical entity id) used by the
  * mention detector and by strategy 1 of the resolution cascade.
  *
  * Several aliases share a canonical id (canonicalization targets for the
  * MinHash-LSH + connected-components stage), and `SparkEngine` is the hot
  * entity (present in ~1/3 of turns — the skew-join target).
  */
object Dictionary {

  /** (slot, alias, canonical) — slot is the generator's `event_id % 12` index. */
  val aliasTable: Seq[(Int, String, String)] = Seq(
    (0, "Postgres", "postgres"),
    (1, "PostgreSQL", "postgres"),
    (2, "postgres-db", "postgres"),
    (3, "Kafka", "kafka"),
    (4, "ApacheKafka", "kafka"),
    (5, "Redis", "redis"),
    (6, "S3", "s3"),
    (7, "AmazonS3", "s3"),
    (8, "Spark", "spark"),
    (9, "ApacheSpark", "spark"),
    (10, "Flink", "flink"),
    (11, "Airflow", "airflow")
  )

  val hotAlias = "SparkEngine"
  val hotCanonical = "sparkengine"

  /** alias -> canonical, including the hot entity. */
  val aliasToCanonical: Map[String, String] =
    aliasTable.map { case (_, a, c) => a -> c }.toMap + (hotAlias -> hotCanonical)

  /** Curated topic -> canonical-member map for Concept nodes (the reference
    * names Concept as a node type and declares Concept-`Includes`-anything,
    * ast/src/lang/graphs/mod.rs:30-56,83-99, but its builder never emits
    * them — here Concepts are first-class graph citizens). Members are
    * PRE-cluster canonicals; the Includes edge targets the member's
    * post-canonicalization Entity cluster, and a Concept only materializes
    * when at least one member entity was observed in the corpus.
    */
  val conceptTopics: Seq[(String, String)] = Seq(
    ("storage", "postgres"),
    ("storage", "redis"),
    ("storage", "s3"),
    ("streaming", "kafka"),
    ("streaming", "flink"),
    ("compute", "spark"),
    ("compute", "sparkengine"),
    ("orchestration", "airflow")
  )

  /** Alternation pattern for the mention scanner. Longer aliases first so
    * leftmost-first alternation (java.util.regex and RE2 both) never matches
    * a prefix alias inside a longer one (Spark ⊂ SparkEngine/ApacheSpark,
    * S3 ⊂ AmazonS3, Postgres ⊂ PostgreSQL).
    */
  val aliasPattern: String =
    (aliasTable.map(_._2) :+ hotAlias)
      .sortBy(a => (-a.length, a))
      .mkString("(", "|", ")")

  /** Verb + path pattern for Endpoint/Request mentions (linker analog,
    * ast/src/lang/linker.rs:329-360 extracts verbs with 11 such regexes). */
  val verbPathPattern: String = "(GET|POST|PUT|DELETE) (/[a-z0-9/{}$]+)"

  /** Handler-function mention pattern (Endpoint meta.handler analog,
    * ast/src/lang/asg.rs:155-160). */
  val handlerPattern: String = "([A-Za-z0-9-]+_handler)"
}
