"""Deterministic synthetic HBSIR fixtures (FIXTURES.md schemas).

Three survey years exercising the engine's year-versioned paths:
* 1375 — 8-digit IDs, external weights, food-only Original_Expenditures
* 1394 — 11-digit IDs, external weights, food+durable
* 1400 — 11-digit IDs, weights from household_information, food+durable

IDs encode attributes (digit 0 = Urban_Rural 1|2, digits 1-2 = Province,
digits 1-4 = County), weights are exact decimals so weighted means are
hand-checkable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

YEARS = (1375, 1394, 1400)
FOOD_CODES = (11150, 11250, 11350, 11850, 19990)
DURABLE_CODES = (31150, 31450, 31990)


def _make_id(year: int, urban: int, province: int, county: int, serial: int) -> int:
    if year >= 1392:
        return int(f"{urban}{province:02d}{county:02d}{serial:06d}")
    return int(f"{urban}{province:02d}{county:02d}{serial:03d}")


def households(year: int) -> list[dict]:
    rng = np.random.RandomState(year)
    rows = []
    serial = 0
    for urban in (1, 2):
        for province in (10, 23):
            for _ in range(5):
                serial += 1
                county = province % 7 + 1
                hid = _make_id(year, urban, province, county, serial)
                rows.append(
                    {
                        "Year": year,
                        "ID": hid,
                        "Urban": urban,
                        "Province": province,
                        "Weight": float(rng.randint(1, 9)) / 2,  # .5 steps
                        "Month": int(rng.randint(1, 13)),
                        "Members": int(rng.randint(1, 6)),
                    }
                )
    return rows


def build_tables() -> dict[tuple[int, str], pd.DataFrame]:
    tables: dict[tuple[int, str], pd.DataFrame] = {}
    for year in YEARS:
        hh = households(year)
        rng = np.random.RandomState(year * 7)

        tables[(year, "household_information")] = pd.DataFrame(
            {
                "Year": [h["Year"] for h in hh],
                "ID": [h["ID"] for h in hh],
                "Month": [h["Month"] for h in hh],
                "Weight": [h["Weight"] for h in hh],
            }
        )
        if year <= 1395:
            tables[(year, "weights")] = pd.DataFrame(
                {
                    "Year": [h["Year"] for h in hh],
                    "ID": [h["ID"] for h in hh],
                    "Weight": [h["Weight"] for h in hh],
                }
            )

        members = []
        for h in hh:
            for m in range(1, h["Members"] + 1):
                members.append(
                    {
                        "Year": year,
                        "ID": h["ID"],
                        "Member_Number": m,
                        "Age": int(rng.randint(1, 80)),
                        "Sex": "Male" if rng.randint(0, 2) else "Female",
                    }
                )
        tables[(year, "members_properties")] = pd.DataFrame(members)

        food = []
        for h in hh:
            for code in FOOD_CODES[: 2 + h["ID"] % 3]:
                food.append(
                    {
                        "Year": year,
                        "ID": h["ID"],
                        "Code": code,
                        "Provision_Method": "Purchase",
                        "Duration": 30,
                        "Expenditure": float(rng.randint(100, 10_000)),
                    }
                )
        # a few rows with excluded codes (apply_filter target) and nulls (P7)
        food.append({"Year": year, "ID": hh[0]["ID"], "Code": 18888,
                     "Provision_Method": "Purchase", "Duration": 30, "Expenditure": 5.0})
        food.append({"Year": year, "ID": hh[1]["ID"], "Code": 11150,
                     "Provision_Method": "Purchase", "Duration": 30, "Expenditure": None})
        tables[(year, "food")] = pd.DataFrame(food)

        durable = []
        for h in hh[::2]:
            for code in DURABLE_CODES[: 1 + h["ID"] % 2]:
                durable.append(
                    {
                        "Year": year,
                        "ID": h["ID"],
                        "Code": code,
                        "Duration": 360,
                        "Expenditure": float(rng.randint(1_000, 50_000)),
                        "Secondhand_Sale": (
                            float(rng.randint(100, 900)) if rng.randint(0, 3) == 0 else None
                        ),
                    }
                )
        tables[(year, "durable")] = pd.DataFrame(durable)

        house_spec = []
        for h in hh:
            house_spec.append(
                {
                    "Year": year,
                    "ID": h["ID"],
                    "Tenure": "Owned_Estate" if rng.randint(0, 2) else "Rent",
                    "Number_of_Rooms": int(rng.randint(1, 7)),
                    "Space": int(rng.randint(30, 300)),
                    "Car": bool(rng.randint(0, 2)),
                }
            )
        tables[(year, "house_specifications")] = pd.DataFrame(house_spec)

        employment = []
        for h in hh:
            if h["ID"] % 3 == 0:
                continue  # not every household has employment income
            employment.append(
                {
                    "Year": year,
                    "ID": h["ID"],
                    "Member_Number": 1,
                    "Job_Code": int(rng.randint(1000, 9999)),
                    "Sector": "Private" if rng.randint(0, 2) else "Public",
                    "Monthly_Net_Income": float(rng.randint(100, 2_000)),
                    "Yearly_Net_Income": float(rng.randint(1_200, 24_000)),
                }
            )
        tables[(year, "employment_income")] = pd.DataFrame(employment)

        self_emp = []
        for h in hh:
            if h["ID"] % 4 != 0:
                continue
            self_emp.append(
                {
                    "Year": year,
                    "ID": h["ID"],
                    "Member_Number": 1,
                    "Job_Code": int(rng.randint(1000, 9999)),
                    "Is_Agricultural": bool(rng.randint(0, 2)),
                    "Sales": float(rng.randint(1_000, 90_000)),
                    "Profit": float(rng.randint(-2_000, 40_000)),
                }
            )
        tables[(year, "self_employed_income")] = pd.DataFrame(self_emp)

        subsidy = []
        for h in hh:
            subsidy.append(
                {
                    "Year": year,
                    "ID": h["ID"],
                    "Member_Number": 1,
                    "Number_of_Individuals": float(h["Members"]),
                    "Subsidy": float(455 * h["Members"]),
                }
            )
        tables[(year, "subsidy")] = pd.DataFrame(subsidy)

        other_income = []
        for h in hh:
            other_income.append(
                {
                    "Year": year,
                    "ID": h["ID"],
                    "Member_Number": 1,
                    "Retirement": float(rng.randint(0, 2) * rng.randint(100, 900)),
                    "Rent": float(rng.randint(0, 2) * rng.randint(50, 500)),
                    "Interest": None,
                    "Aid": float(rng.randint(0, 300)),
                    "Home_Production": 0.0,
                    "Transfer": float(rng.randint(0, 2) * 250),
                }
            )
        tables[(year, "other_income")] = pd.DataFrame(other_income)
    return tables


def write_fixture_parquet(root: str) -> dict[tuple[int, str], pd.DataFrame]:
    os.makedirs(root, exist_ok=True)
    tables = build_tables()
    for (year, name), df in tables.items():
        df.to_parquet(os.path.join(root, f"{year}_{name}.parquet"), index=False)
    return tables
