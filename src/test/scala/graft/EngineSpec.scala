package graft

import graft.engine.{Frame, GraftDB}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** End-to-end parity with the reference's demo program (`main.rs:6-44`)
  * and README golden outputs (`README.md:67-112`), through our façade.
  *
  * Fixture CSVs reproduce the reference's demo data (`data/test_data.csv`,
  * `data/employee.csv`, `data/rank.csv`, `data/department.csv`) so the
  * goldens are comparable. Documented divergences from the reference are
  * asserted AS divergences (standard SQL semantics, not the reference's
  * bugs): group keys included in aggregate output
  * (`aggregate/mod.rs:117-121`), true Cartesian product
  * (`cross_join.rs:74-180`), tan is tan (`unary.rs:96`).
  */
class EngineSpec extends AnyFunSuite with SparkFixture {

  private lazy val dataDir: String = {
    val dir = Files.createDirectories(
      Paths.get("target", "test-fixtures")).toAbsolutePath
    def write(name: String, content: String): Unit =
      Files.writeString(dir.resolve(name), content)
    write("test_data.csv",
      """id,name,age,score
        |1,veeupup,23,60.0
        |2,alex,20,90.1
        |4,lynne,18,99.99
        |5,alice,19,81.1
        |6,bob,20,82.2
        |7,jack,21,83.3
        |8,cock,22,84.4
        |9,primer,23,85.5
        |""".stripMargin)
    write("employee.csv",
      """id,name,department_id,rank
        |1,vee,1,1
        |2,lynne,1,0
        |3,Alex,2,0
        |4,jack,2,1
        |5,mike,3,2
        |""".stripMargin)
    write("rank.csv",
      """id,rank_name
        |0,master
        |1,diamond
        |2,grandmaster
        |""".stripMargin)
    write("department.csv",
      """id,department_name
        |1,IT
        |2,Marketing
        |3,Human Resource
        |""".stripMargin)
    dir.toString
  }

  private lazy val db: GraftDB = {
    val d = new GraftDB(spark)
    d.createCsvTable("t1", s"$dataDir/test_data.csv")
    d.createCsvTable("employee", s"$dataDir/employee.csv")
    d.createCsvTable("rank", s"$dataDir/rank.csv")
    d.createCsvTable("department", s"$dataDir/department.csv")
    d
  }

  test("demo 1: scan→filter→project→offset→limit (README.md:70-76)") {
    val rows = db.runSql(
      "select id, name, age + 100 as age_plus from t1 where id < 9 " +
        "order by id limit 3 offset 2").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((4, "lynne", 118), (5, "alice", 119), (6, "bob", 120)))
  }

  test("demo 2: three-way equi-join (README.md:77-86)") {
    val rows = db.runSql(
      """select employee.id, employee.name, rank_name, department_name
        |from employee
        |join rank on employee.rank = rank.id
        |join department on employee.department_id = department.id
        |order by employee.id""".stripMargin).collect()
    assert(rows.map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1, "vee", "diamond", "IT"), (2, "lynne", "master", "IT"),
        (3, "Alex", "master", "Marketing"), (4, "jack", "diamond", "Marketing"),
        (5, "mike", "grandmaster", "Human Resource")))
  }

  test("demo 3: cross join is the true 5×3 product (README.md:87-104)") {
    val rows = db.runSql("select employee.name, rank_name " +
      "from employee cross join rank").collect()
    assert(rows.length == 15)
    val set = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(set.size == 15) // every (employee, rank) combination exactly once
    assert(set.contains(("vee", "master")) && set.contains(("mike", "grandmaster")))
  }

  test("demo 4: aggregate with expression group key (README.md:105-111); " +
    "divergence: group key included in output") {
    val rows = db.runSql(
      """select id % 3 as k, count(id) as cnt, sum(age) as sum_age,
        |       sum(score) as sum_score, avg(score) as avg_score,
        |       max(score) as max_score, min(score) as min_score
        |from t1 group by id % 3 order by k""".stripMargin).collect()
    assert(rows.length == 3)
    val byK = rows.map(r => r.getInt(0) -> r).toMap
    // k=2 row: ids {2,5,8} — README's first output row
    assert(byK(2).getLong(1) == 3 && byK(2).getLong(2) == 61)
    assert(math.abs(byK(2).getDouble(3) - 255.6) < 1e-9)
    assert(math.abs(byK(2).getDouble(4) - 85.2) < 1e-9)
    // k=1 row: ids {1,4,7} — README's second row incl. the 243.29000000000002
    assert(math.abs(byK(1).getDouble(3) - 243.29000000000002) < 1e-9)
    assert(math.abs(byK(1).getDouble(4) - 81.09666666666668) < 1e-9)
    assert(byK(1).getDouble(5) == 99.99 && byK(1).getDouble(6) == 60.0)
    // k=0 row: ids {6,9}
    assert(byK(0).getLong(1) == 2 && math.abs(byK(0).getDouble(3) - 167.7) < 1e-9)
  }

  test("csv schema inference (reference infers from 3 rows, csv.rs:77-86; " +
    "we scan the whole file — richer but comparable types)") {
    val schema = spark.table("t1").schema
    assert(schema.fieldNames.toSeq == Seq("id", "name", "age", "score"))
    assert(schema("id").dataType == IntegerType)
    assert(schema("name").dataType == StringType)
    assert(schema("score").dataType == DoubleType)
  }

  test("csv inferRows=3 mirrors the reference's max_read_records=Some(3) " +
    "(csv.rs:37): types come from the first 3 data rows only") {
    val f = java.nio.file.Files.createTempFile("graft_infer", ".csv")
    // column b looks integral for 3 rows, goes fractional on row 4 —
    // 3-row inference types it INT (as the reference would); whole-file
    // inference types it DOUBLE.
    java.nio.file.Files.writeString(f,
      "a,b\n1,10\n2,20\n3,30\n4,40.5\n")
    val db = new graft.engine.GraftDB(spark)
    val narrow = db.createCsvTable("t_infer3", f.toString, inferRows = Some(3))
    assert(narrow.schema("b").dataType == IntegerType)
    val full = db.createCsvTable("t_inferall", f.toString)
    assert(full.schema("b").dataType == DoubleType)
    java.nio.file.Files.delete(f)
  }

  test("csv timestampFormat mirrors CsvConfig.datetime_format (csv.rs:29, " +
    "default None csv.rs:41): custom-format stamps parse as TIMESTAMP") {
    val f = java.nio.file.Files.createTempFile("graft_tsfmt", ".csv")
    java.nio.file.Files.writeString(f,
      "id,ts\n1,2024/01/15 08:30:00\n2,2024/02/20 17:45:10\n")
    val db = new graft.engine.GraftDB(spark)
    // with the format: inference types ts TIMESTAMP and values parse
    val typed = db.createCsvTable("t_tsfmt", f.toString,
      timestampFormat = Some("yyyy/MM/dd HH:mm:ss"))
    assert(typed.schema("ts").dataType == TimestampType)
    val hours = typed.selectExpr("hour(ts)").collect().map(_.getInt(0)).toSeq
    assert(hours == Seq(8, 17))
    // without it (the reference's None default): slashes aren't ISO-8601,
    // the column stays a plain string — same fallback the reference's
    // arrow CSV reader has
    val untyped = db.createCsvTable("t_tsfmt_none", f.toString)
    assert(untyped.schema("ts").dataType == StringType)
    java.nio.file.Files.delete(f)
  }

  test("mem table with projection pruning (memory.rs:31-41)") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", DoubleType)))
    db.createMemTable("mem1", schema,
      Seq(Row(1, "x", 1.5), Row(2, "y", 2.5)))
    // column reorder/prune like the reference's scan(Some(vec![2,1]))
    val rows = db.runSql("select c, b from mem1 order by c").collect()
    assert(rows.map(r => (r.getDouble(0), r.getString(1))).toSeq ==
      Seq((1.5, "x"), (2.5, "y")))
  }

  test("empty table: schema, zero rows (empty.rs:47-61)") {
    val schema = StructType(Seq(StructField("x", LongType)))
    db.createEmptyTable("empty1", schema)
    assert(db.runSql("select * from empty1").collect().isEmpty)
    assert(spark.table("empty1").schema == schema)
  }

  test("Frame builder chain mirrors dataframe.rs:152-182") {
    val f = db.table("t1")
      .filter(col("id") < 9)
      .project(col("id"), col("name"), (col("age") + 100).as("age_plus"))
      .sort(col("id"))
      .offset(2)
      .limit(3)
    val rows = f.collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((4, "lynne", 118), (5, "alice", 119), (6, "bob", 120)))
  }

  test("Frame join with key list; empty keys ⇒ cross (dataframe.rs:114-122)") {
    val emp = db.table("employee")
    val rnk = db.table("rank")
    val joined = emp.join(rnk, "inner", Seq(("rank", "id")))
    assert(joined.collect().length == 5)
    assert(emp.join(rnk, "inner", Seq.empty).collect().length == 15)
  }

  test("Frame aggregate: global (no group) and grouped") {
    val t = db.table("t1")
    val g = t.aggregate(Seq.empty, Seq(count(col("id")).as("n")))
    assert(g.collect().head.getLong(0) == 8)
    val by = t.aggregate(Seq((col("id") % 3).as("k")),
      Seq(count(col("id")).as("n")))
    assert(by.collect().length == 3)
  }
}
