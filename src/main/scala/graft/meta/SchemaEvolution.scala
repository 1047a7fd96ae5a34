package graft.meta

import org.apache.spark.sql.types.StructType

/**
 * Schema-evolution detection between two versions of a table
 * (reference: pramen/api .../api/SchemaDifference.scala,
 * api/FieldChange.scala — new/deleted/changed fields).
 */
sealed trait FieldChange
object FieldChange {
  final case class Added(name: String, dataType: String) extends FieldChange
  final case class Removed(name: String, dataType: String) extends FieldChange
  final case class TypeChanged(name: String, oldType: String, newType: String) extends FieldChange
}

object SchemaEvolution {
  /** Field-level diff, order-insensitive, case-insensitive names (Spark SQL default). */
  def diff(oldSchema: StructType, newSchema: StructType): Seq[FieldChange] = {
    val oldMap = oldSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    val newMap = newSchema.fields.map(f => f.name.toLowerCase -> f).toMap
    val added = newSchema.fields.filterNot(f => oldMap.contains(f.name.toLowerCase))
      .map(f => FieldChange.Added(f.name, f.dataType.simpleString))
    val removed = oldSchema.fields.filterNot(f => newMap.contains(f.name.toLowerCase))
      .map(f => FieldChange.Removed(f.name, f.dataType.simpleString))
    val changed = newSchema.fields.flatMap { f =>
      oldMap.get(f.name.toLowerCase).collect {
        case old if old.dataType != f.dataType =>
          FieldChange.TypeChanged(f.name, old.dataType.simpleString, f.dataType.simpleString)
      }
    }
    (added ++ removed ++ changed).toSeq
  }

  def isCompatible(oldSchema: StructType, newSchema: StructType): Boolean =
    diff(oldSchema, newSchema).forall {
      case _: FieldChange.Added => true
      case _ => false
    }
}
