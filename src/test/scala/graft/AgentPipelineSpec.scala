package graft

import graft.model.Listing
import graft.operators.AgentPipeline

/** EP3 golden semantics (agent_manager.py + data_processing.py):
  * project → filter empty phones → anti-join → sorted-set city agg →
  * tag transform. */
class AgentPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val listings = Seq(
    Listing.minimal("1", 100, city = Some("provo"),
      agentName = Some("jane doe"), agentPhone = Some("(801) 555-0001")),
    Listing.minimal("2", 200, city = Some("orem"),
      agentName = Some("jane doe"), agentPhone = Some("(801) 555-0001")),
    Listing.minimal("3", 300, city = Some("provo"), // duplicate city for jane
      agentName = Some("jane doe"), agentPhone = Some("(801) 555-0001")),
    Listing.minimal("4", 400, city = Some("lehi"),
      agentName = Some("bob known"), agentPhone = Some("8015550002")),
    Listing.minimal("5", 500, city = Some("sandy"),
      agentName = Some("no phone"), agentPhone = Some("")), // F3 drops
  ).toDS()

  private val contacts = Seq(("bob", "known", "+18015550002"))
    .toDF("first_name", "last_name", "phone")

  test("EP3: anti-join removes known contacts, F3 drops empty phones") {
    val (unique, tagged) = AgentPipeline.run(listings, contacts)
    val rows = unique.collect()
    assert(rows.length == 1) // only jane survives
    val jane = rows.head
    assert(jane.getString(0) == "jane")
    assert(jane.getString(1) == "doe")
    assert(jane.getString(2) == "+18015550001") // E1 applied
    assert(jane.getString(3) == "orem, provo")  // sorted distinct cities

    val t = tagged.collect().head
    assert(t.getAs[String]("first_name") == "Jane") // E2
    assert(t.getAs[String]("tags") ==
      "orem Utah Market, provo Utah Market, realtor") // E12
    assert(!tagged.columns.contains("city")) // P3 drop
  }

  test("EP3: empty listings short-circuit (F8)") {
    val empty = spark.emptyDataset[Listing]
    val (unique, _) = AgentPipeline.run(empty, contacts)
    assert(unique.isEmpty)
  }
}
