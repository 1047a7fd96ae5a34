package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** M6: schema-evolution detection. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private val v1 = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("no changes") {
    assert(SchemaEvolution.diff(v1, v1).isEmpty)
    assert(SchemaEvolution.isCompatible(v1, v1))
  }

  test("added field detected and compatible") {
    val v2 = v1.add(StructField("extra", IntegerType))
    assert(SchemaEvolution.diff(v1, v2) == Seq(FieldChange.Added("extra", "int")))
    assert(SchemaEvolution.isCompatible(v1, v2))
  }

  test("removed field detected and incompatible") {
    val v2 = StructType(v1.fields.filterNot(_.name == "name"))
    assert(SchemaEvolution.diff(v1, v2) == Seq(FieldChange.Removed("name", "string")))
    assert(!SchemaEvolution.isCompatible(v1, v2))
  }

  test("type change detected and incompatible") {
    val v2 = StructType(v1.fields.map {
      case f if f.name == "amount" => f.copy(dataType = DecimalType(18, 2))
      case f => f
    })
    assert(SchemaEvolution.diff(v1, v2) ==
      Seq(FieldChange.TypeChanged("amount", "double", "decimal(18,2)")))
    assert(!SchemaEvolution.isCompatible(v1, v2))
  }

  test("name matching is case-insensitive; order-insensitive") {
    val v2 = StructType(Seq(
      StructField("AMOUNT", DoubleType), StructField("Name", StringType),
      StructField("ID", LongType)))
    assert(SchemaEvolution.diff(v1, v2).isEmpty)
  }
}
