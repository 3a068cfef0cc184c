package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

import graft.dates.PeriodDates

class PeriodDatesSpec extends AnyFunSuite {

  test("day header grammar: X%Y.%m.%d parses, month form rejected") {
    assert(PeriodDates.headerToDate("X2022.03.01", "day").contains(LocalDate.of(2022, 3, 1)))
    assert(PeriodDates.headerToDate("X2022.03", "day").isEmpty)
    assert(PeriodDates.headerToDate("SKN", "day").isEmpty)
    assert(PeriodDates.headerToDate("X2022.3.1", "day").isEmpty) // zero-padding required
  }

  test("month header grammar: X%Y.%m parses, day form rejected") {
    assert(PeriodDates.headerToDate("X2021.11", "month").contains(LocalDate.of(2021, 11, 1)))
    assert(PeriodDates.headerToDate("X2021.11.05", "month").isEmpty)
  }

  test("unknown period raises — strictness is part of the semantics") {
    intercept[IllegalArgumentException](PeriodDates.headerToDate("X2022.03.01", "week"))
    intercept[IllegalArgumentException](PeriodDates.validatePeriod("hour"))
  }

  test("ISO value serialization is period-granular") {
    assert(PeriodDates.dateToValue(LocalDate.of(2022, 3, 1), "day") == "2022-03-01")
    assert(PeriodDates.dateToValue(LocalDate.of(2022, 3, 1), "month") == "2022-03")
  }

  test("end_date < start_date rejected; inclusive bounds") {
    intercept[IllegalArgumentException](PeriodDates.validateRange(
      Some(LocalDate.of(2022, 3, 2)), Some(LocalDate.of(2022, 3, 1))))
    assert(PeriodDates.inRange(LocalDate.of(2022, 3, 1),
      Some(LocalDate.of(2022, 3, 1)), Some(LocalDate.of(2022, 3, 1))))
    assert(PeriodDates.inRange(LocalDate.of(2022, 3, 1), None, None))
  }

  // Deterministic pseudo-random date sample (seeded — property-style check
  // without an extra test-framework bridge dependency).
  private val dates: Seq[LocalDate] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(300)(LocalDate.ofEpochDay(rnd.nextLong(80000L)))
  }

  test("property: header->date->value->date roundtrip (day)") {
    for (d <- dates) {
      val header = f"X${d.getYear}%04d.${d.getMonthValue}%02d.${d.getDayOfMonth}%02d"
      assert(PeriodDates.headerToDate(header, "day").contains(d))
      assert(PeriodDates.isoToDate(PeriodDates.dateToValue(d, "day"), "day") == d)
    }
  }

  test("property: month roundtrip pins day 1") {
    for (d <- dates) {
      val header = f"X${d.getYear}%04d.${d.getMonthValue}%02d"
      assert(PeriodDates.headerToDate(header, "month").contains(d.withDayOfMonth(1)))
      assert(PeriodDates.isoToDate(PeriodDates.dateToValue(d, "month"), "month") == d.withDayOfMonth(1))
    }
  }
}
