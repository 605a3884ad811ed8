package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS hubs and authorities (Kleinberg, JACM 1999) — the directed /
  * bipartite ranking X34's PageRank doesn't give: on a who-consumes-what
  * graph (customer→part, user→domain, doc→cited-doc), a good HUB points
  * at good authorities and a good AUTHORITY is pointed at by good hubs —
  * two mutually-recursive scores where PageRank collapses them into one.
  *
  * Fixed-point discipline (the PageRank convention): scores are integer
  * micro-units (Scale = 10⁹ — bounds nodes·Scale inside a long up to
  * ~9·10⁹ nodes), each half-round is an exact long sum over edges
  * followed by integral renormalization a ← a div max(1, Σa div Scale)
  * — deterministic remainder behavior, no floats anywhere, so the whole
  * iteration replays bitwise in any engine. Rounds are budgeted, not
  * convergence-tested (X79/X90).
  *
  * Scale: per half-round, ONE join of 16-byte scores onto the edge list
  * (hash-partitioned on the source side's key) + a map-side-combined
  * sum + a 1-row total broadcast back for the renormalizing projection.
  * The edge list is cached across rounds with the LabelProp/PageRank
  * lifecycle (one eager count at the end, everything released).
  */
object Hits {

  val Scale: Long = 1000000000L

  /** Run `rounds` full HITS iterations over the directed edge list.
    * Returns (node, role ∈ {hub, authority}, score) — hubs are source
    * nodes, authorities destination nodes, both in micro-units of the
    * final renormalization.
    */
  def hubsAndAuthorities(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, materialize: Boolean = true): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def keep(df: DataFrame): DataFrame =
      if (!materialize) df
      else { cached += df.persist(StorageLevel.MEMORY_AND_DISK); df }
    val e = keep(edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
      .distinct())
    var hubs = keep(e.select(col("s").as("node")).distinct()
      .withColumn("score", lit(Scale)))
    var auths: DataFrame = null
    for (_ <- 1 to rounds) {
      val aRaw = e.join(hubs.select(col("node").as("s"), col("score")), "s")
        .groupBy(col("d").as("node"))
        .agg(sum("score").as("raw"))
      auths = keep(renorm(aRaw))
      val hRaw = e.join(auths.select(col("node").as("d"), col("score")), "d")
        .groupBy(col("s").as("node"))
        .agg(sum("score").as("raw"))
      hubs = keep(renorm(hRaw))
    }
    val out = hubs.select(col("node"), lit("hub").as("role"), col("score"))
      .unionByName(auths.select(col("node"), lit("authority").as("role"),
        col("score")))
    if (materialize) {
      val m = out.persist(StorageLevel.MEMORY_AND_DISK)
      m.count()
      cached.foreach(_.unpersist(false))
      m
    } else out
  }

  /** a ← a div max(1, Σa div Scale): exact integral renormalization —
    * the largest score lands near Scale, every op is a long.
    */
  private def renorm(raw: DataFrame): DataFrame = {
    val total = raw.agg(greatest(
      expr(s"sum(raw) div ${Scale}L"), lit(1L)).as("denom"))
    raw.crossJoin(broadcast(total))
      .select(col("node"), expr("raw div denom").as("score"))
  }
}
