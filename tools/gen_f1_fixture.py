#!/usr/bin/env python3
"""Deterministic F1 bronze CSV fixture generator (seed 42).

Writes fixtures/f1_bronze/<year>.csv — the `;`-separated, header-row,
all-string bronze layout the reference ingests (scripts/02_bronze.py:97).
The r2_f1_pipeline oracle reads the SAME files via DuckDB read_csv, so the
fixture is committed (re-running this script is a no-op diff).

Edge cases planted for the coercion gate (SURVEY.md §1.2):
  - DNF rows with an EMPTY Position cell (NULL → sentinel 99);
  - float-looking position strings ("3.0") summed/cast as strings;
  - sprint weekends (every 3rd round) + one driver who never sprints;
  - two rounds sharing one calendar date (reference row multiplication),
    placed ON the r2 reference date 2023-06-30;
  - a mid-season reference date so current-season != trailing-year.
"""
import os
import random

SEED = 42
YEARS = [2021, 2022, 2023]
ROUNDS = 20
DRIVERS = [
    ("ver", "redbull"), ("ham", "mercedes"), ("lec", "ferrari"),
    ("per", "redbull"), ("rus", "mercedes"), ("sai", "ferrari"),
    ("nor", "mclaren"), ("pia", "mclaren"), ("alo", "aston"),
    ("str", "aston"), ("gas", "alpine"), ("oco", "alpine"),
]
NO_SPRINT_DRIVER = "oco"  # never enters sprints → NULL sprint aggregates
LOCATIONS = ["Bahrain", "Jeddah", "Melbourne", "Suzuka", "Shanghai",
             "Miami", "Imola", "Monaco", "Montreal", "Barcelona",
             "Spielberg", "Silverstone", "Budapest", "Spa", "Zandvoort",
             "Monza", "Baku", "Singapore", "Austin", "Mexico"]
RACE_POINTS = [25, 18, 15, 12, 10, 8, 6, 4, 2, 1]
SPRINT_POINTS = [8, 7, 6, 5, 4, 3, 2, 1]

HEADER = ("DriverId;TeamId;Position;GridPosition;Status;Points;Laps;"
          "identifier;date;year;RoundNumber;Location")


def round_date(year, rnd):
    # ~biweekly from early March; rounds 12 and 13 of 2023 SHARE 06-30.
    if year == 2023 and rnd in (12, 13):
        return "2023-06-30"
    day_of_year = 63 + (rnd - 1) * 14
    month = 1 + (day_of_year - 1) // 28  # synthetic 28-day months, <= 12
    day = 1 + (day_of_year - 1) % 28
    return f"{year}-{month:02d}-{day:02d}"


def session_rows(rng, year, rnd, identifier, hour):
    entrants = [d for d in DRIVERS
                if not (identifier == "sprint" and d[0] == NO_SPRINT_DRIVER)]
    grid = entrants[:]
    rng.shuffle(grid)
    finish = grid[:]
    # mild shuffle of the grid → finishing order correlates with grid
    for i in range(len(finish) - 1):
        if rng.random() < 0.35:
            finish[i], finish[i + 1] = finish[i + 1], finish[i]
    points = RACE_POINTS if identifier == "race" else SPRINT_POINTS
    laps = 57 if identifier == "race" else 17
    date = round_date(year, rnd)
    loc = LOCATIONS[(rnd - 1) % len(LOCATIONS)]
    rows = []
    for pos0, (drv, team) in enumerate(finish):
        dnf = rng.random() < 0.08
        pos = "" if dnf else f"{pos0 + 1}.0"
        status = "DNF" if dnf else "Finished"
        pts = 0.0 if dnf else float(points[pos0] if pos0 < len(points) else 0)
        lap = rng.randint(1, laps // 2) if dnf else laps
        gridpos = f"{grid.index((drv, team)) + 1}.0"
        rows.append(f"{drv};{team};{pos};{gridpos};{status};{pts};{lap};"
                    f"{identifier};{date} {hour}:00:00;{year};{rnd};{loc}")
    return rows


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "f1_bronze")
    os.makedirs(out, exist_ok=True)
    rng = random.Random(SEED)
    for year in YEARS:
        rows = []
        for rnd in range(1, ROUNDS + 1):
            if rnd % 3 == 0:
                rows += session_rows(rng, year, rnd, "sprint", 11)
            rows += session_rows(rng, year, rnd, "race", 15)
        path = os.path.join(out, f"{year}.csv")
        with open(path, "w") as f:
            f.write("\n".join([HEADER] + rows) + "\n")
        print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
