package graft.geo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Loader for the golden fixtures under src/test/resources/golden/ —
  * expected values produced by executing the REFERENCE'S OWN Python code
  * (tools/gen_golden.py), so these specs verify the port against the real
  * semantics rather than a Scala re-derivation.
  */
object Golden {
  private val mapper = new ObjectMapper()

  def load(name: String): Vector[JsonNode] = {
    val in = getClass.getResourceAsStream(s"/golden/$name.json")
    require(in != null, s"missing golden fixture $name (run tools/gen_golden.py)")
    try mapper.readTree(in).elements().asScala.toVector
    finally in.close()
  }

  implicit final class NodeOps(private val n: JsonNode) extends AnyVal {
    def d(field: String): Double = n.get(field).asDouble()
    def i(field: String): Int = n.get(field).asInt()
    def arr(field: String): Vector[JsonNode] = n.get(field).elements().asScala.toVector
    def darr(field: String): Vector[Double] = arr(field).map(_.asDouble())
  }
}
