package graft.lake

import org.apache.spark.sql.connector.catalog.TableChange
import org.apache.spark.sql.connector.catalog.TableChange._
import org.apache.spark.sql.types._

/** ALTER TABLE schema/property evolution with stable field ids, so a
  * renamed column still reads old data files (reference:
  * iceberg_it.py:352-365 — add/rename/drop incl. nested `point.z`,
  * int->bigint widening, DROP NOT NULL).
  */
object SchemaEvolution {

  def applyChanges(meta: TableMeta, changes: Seq[TableChange]): TableMeta = {
    var schema = meta.schema
    var props = meta.properties
    var spec = meta.partitionSpec
    var schemaChanged = false

    changes.foreach {
      case c: SetProperty => props += (c.property() -> c.value())
      case c: RemoveProperty => props -= c.property()
      case c: AddColumn =>
        schema = addColumn(schema, c.fieldNames().toSeq, c.dataType(),
          c.isNullable, Option(c.comment()))
        schemaChanged = true
      case c: RenameColumn =>
        schema = mapField(schema, c.fieldNames().toSeq)(f => f.copy(name = c.newName()))
        // The partition spec references its source column by CURRENT
        // dotted path (Iceberg tracks field ids and re-displays the new
        // name; here the tracked name IS the reference) — a spec left
        // pointing at a stale path would stop resolving in every later
        // write's transform evaluation and required ordering, and if a
        // re-added column later reclaimed the stale name the transform
        // would silently partition on the impostor. Three cases must
        // follow the rename: the source itself (any depth), and — for a
        // nested source like "s.ts" — a rename of any ancestor struct
        // ("s" -> "t" must retarget to "t.ts"). Combined with the drop
        // guard below (a source column or its ancestors cannot be
        // dropped while the spec references them), path tracking is
        // equivalent to field-id tracking. Spec field NAMES (e.g.
        // "ts_day") are display names and stay.
        val oldPath = c.fieldNames().mkString(".")
        val newPath = (c.fieldNames().init :+ c.newName()).mkString(".")
        spec = spec.map { f =>
          val src = f.sourceColumn
          if (src.equalsIgnoreCase(oldPath)) f.copy(sourceColumn = newPath)
          else if (src.toLowerCase.startsWith(oldPath.toLowerCase + "."))
            f.copy(sourceColumn = newPath + src.substring(oldPath.length))
          else f
        }
        schemaChanged = true
      case c: UpdateColumnType =>
        val from = fieldAt(schema, c.fieldNames().toSeq).dataType
        require(widenOk(from, c.newDataType()),
          s"cannot change ${c.fieldNames().mkString(".")} from $from to ${c.newDataType()}")
        schema = mapField(schema, c.fieldNames().toSeq)(f => f.copy(dataType = c.newDataType()))
        schemaChanged = true
      case c: UpdateColumnNullability =>
        schema = mapField(schema, c.fieldNames().toSeq)(f => f.copy(nullable = c.nullable()))
        schemaChanged = true
      case c: UpdateColumnComment =>
        schema = mapField(schema, c.fieldNames().toSeq) { f =>
          f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString("comment", c.newComment()).build())
        }
        schemaChanged = true
      case c: DeleteColumn =>
        // identifier fields anchor equality deletes (upserts): dropping
        // one would strand every outstanding delete file's key mapping
        // and silently resurrect deleted rows — Iceberg forbids it too
        val dropped = c.fieldNames().mkString(".")
        // a partition source column anchors the live spec: dropping it
        // would leave every later write's transform evaluation
        // unresolvable (Iceberg requires dropping the partition field
        // first, same here)
        // prefix match too: dropping a struct whose INTERNAL field
        // sources the spec ("s" dropped while the spec is days(s.ts))
        // would strand the spec just as surely as dropping s.ts itself
        require(!spec.exists(f =>
            f.sourceColumn.equalsIgnoreCase(dropped) ||
            f.sourceColumn.toLowerCase.startsWith(dropped.toLowerCase + ".")),
          s"cannot drop column $dropped: it is (or contains) a " +
            "partition source column (ALTER TABLE ... DROP PARTITION " +
            "FIELD first)")
        val idFields = props.get(EqDeletes.IdentifierKey)
          .map(_.split(",").map(_.trim.toLowerCase).toSet).getOrElse(Set.empty)
        require(!idFields.contains(dropped.toLowerCase),
          s"cannot drop column $dropped: it is an " +
            "identifier field (DROP IDENTIFIER FIELDS first)")
        // ...and DROP IDENTIFIER FIELDS alone must not open the door:
        // any OUTSTANDING equality-delete file still keys on the
        // column (through its field id) — dropping it would make every
        // read and every repair path throw on the unmappable key,
        // bricking the table with no recovery statement
        val droppedId = schema.fields
          .find(_.name.equalsIgnoreCase(dropped)).flatMap(TableMeta.fieldId)
        val anchored = meta.snapshots.flatMap(_.eqDeleteFiles)
          .distinctBy(_.path).exists { eq =>
            val epochSchema = meta.schemaAt(eq.schemaEpoch)
            eq.keyColumns.exists(kc =>
              epochSchema.fields.find(_.name.equalsIgnoreCase(kc))
                .flatMap(TableMeta.fieldId)
                .exists(id => droppedId.contains(id)))
          }
        require(!anchored,
          s"cannot drop column $dropped: equality-delete files still " +
            "key on it; run rewrite_data_files or " +
            "convert_equality_deletes (and expire old snapshots) first")
        schema = deleteColumn(schema, c.fieldNames().toSeq)
        schemaChanged = true
      case c: UpdateColumnPosition => () // ordering is cosmetic here
      case other =>
        throw new UnsupportedOperationException(s"table change $other")
    }

    if (schemaChanged) {
      val stamped = TableMeta.withFieldIds(schema, meta.highestFieldId)
      meta.copy(properties = props, partitionSpec = spec,
        schemas = meta.schemas :+ stamped.json,
        currentSchemaEpoch = meta.schemas.size)
    } else meta.copy(properties = props, partitionSpec = spec)
  }

  /** Promotion rules (docs/spark-getting-started.md:163-166). */
  private def widenOk(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType | ShortType | IntegerType, LongType) => true
    case (ByteType | ShortType, IntegerType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale == a.scale && b.precision >= a.precision
    case _ => false
  }

  private def fieldAt(schema: StructType, path: Seq[String]): StructField =
    path match {
      case Seq(one) => schema(schema.fieldIndex(one))
      case head +: rest =>
        schema(schema.fieldIndex(head)).dataType match {
          case st: StructType => fieldAt(st, rest)
          case other => throw new IllegalArgumentException(s"$head is $other, not a struct")
        }
    }

  private def mapField(schema: StructType, path: Seq[String])(
      f: StructField => StructField): StructType = path match {
    case Seq(one) =>
      StructType(schema.fields.map(fl => if (fl.name.equalsIgnoreCase(one)) f(fl) else fl))
    case head +: rest =>
      StructType(schema.fields.map { fl =>
        if (fl.name.equalsIgnoreCase(head)) fl.dataType match {
          case st: StructType => fl.copy(dataType = mapField(st, rest)(f))
          case other => throw new IllegalArgumentException(s"$head is $other, not a struct")
        } else fl
      })
  }

  private def addColumn(schema: StructType, path: Seq[String], dt: DataType,
      nullable: Boolean, comment: Option[String]): StructType = {
    val md = comment.map(c => new MetadataBuilder().putString("comment", c).build())
      .getOrElse(Metadata.empty)
    path match {
      case Seq(one) =>
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(one)), s"column $one exists")
        StructType(schema.fields :+ StructField(one, dt, nullable, md))
      case head +: rest =>
        mapField(schema, Seq(head)) { fl =>
          fl.dataType match {
            case st: StructType => fl.copy(dataType = addColumn(st, rest, dt, nullable, comment))
            case other => throw new IllegalArgumentException(s"$head is $other, not a struct")
          }
        }
    }
  }

  private def deleteColumn(schema: StructType, path: Seq[String]): StructType =
    path match {
      case Seq(one) =>
        require(schema.fieldNames.exists(_.equalsIgnoreCase(one)), s"no column $one")
        StructType(schema.fields.filterNot(_.name.equalsIgnoreCase(one)))
      case head +: rest =>
        mapField(schema, Seq(head)) { fl =>
          fl.dataType match {
            case st: StructType => fl.copy(dataType = deleteColumn(st, rest))
            case other => throw new IllegalArgumentException(s"$head is $other, not a struct")
          }
        }
    }
}
