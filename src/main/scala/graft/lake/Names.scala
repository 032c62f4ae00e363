package graft.lake

import org.apache.spark.sql.SparkSession

/** Resolves the catalog-qualified namespace the stored-index
  * machinery (group index, stored IVF) and the streaming ingest
  * loops operate in.
  *
  * Deployments point the library at their own catalog/namespace by
  * setting `spark.graft.lake.namespace` (e.g. `prodcat.ml.indexes`)
  * — the first part is the catalog, the rest the namespace, both of
  * which the caller registers/creates exactly as for the default.
  * Default `lakeq.db` preserves the existing layout (LakeOps.cat
  * registers the `lakeq` catalog over a per-JVM temp warehouse).
  *
  * Driver-side conf reads only — never on an executor path.
  */
object Names {
  val ConfKey = "spark.graft.lake.namespace"
  val Default = "lakeq.db"

  /** Catalog-qualified namespace parts, e.g. Seq("lakeq", "db"). */
  def namespace(s: SparkSession): Seq[String] = {
    val parts = s.conf.get(ConfKey, Default).split('.').toSeq
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"$ConfKey must be <catalog>.<namespace>[.<ns>...], got " +
        s"'${parts.mkString(".")}'")
    parts
  }

  /** Identifier parts for the metadata-log reader (LakeMeta) and ref
    * commands, e.g. Seq("lakeq", "db", table). */
  def parts(s: SparkSession, table: String): Seq[String] =
    namespace(s) :+ table

  /** Fully qualified SQL name, e.g. "lakeq.db.t". */
  def q(s: SparkSession, table: String): String =
    parts(s, table).mkString(".")

  /** The catalog, e.g. "lakeq" — system procedures live at
    * `<catalog>.system`. */
  def catalog(s: SparkSession): String = namespace(s).head

  /** Catalog-relative name, the shape system-procedure `table =>`
    * arguments take, e.g. "db.t". */
  def rel(s: SparkSession, table: String): String =
    (namespace(s).tail :+ table).mkString(".")

  /** Copy the namespace conf plus its catalog's registration keys
    * onto a child session — `SparkSession.newSession()` starts from
    * builder defaults, not the caller's runtime conf, so a clone
    * (e.g. the SPJ probe sessions, which isolate planner confs) would
    * otherwise resolve a conf-set namespace against an unregistered
    * catalog. */
  def carryTo(from: SparkSession, to: SparkSession): Unit = {
    to.conf.set(ConfKey, from.conf.get(ConfKey, Default))
    val prefix = s"spark.sql.catalog.${catalog(from)}"
    from.conf.getAll.foreach { case (k, v) =>
      if (k == prefix || k.startsWith(prefix + ".")) to.conf.set(k, v)
    }
  }
}
