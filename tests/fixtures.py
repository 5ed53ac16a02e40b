"""Deterministic domain fixtures per FIXTURES.md (seeded, no wall
clock): raw job offers with planted duplicates/salaries/skills, raw
HTML blobs, and candidate CVs with hand-computable matching overlaps.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

BASE_TS = "2024-03-0{d}T0{h}:00:00"

SOURCES = ["educarriere_ci", "macarrierepro_net", "goafricaonline", "linkedin_ci"]
CITIES = ["Abidjan", "Bouaké", "Daloa", "Yamoussoukro", "San-Pédro"]
TITLES = [
    "Développeur Python Senior",
    "Data Engineer Spark",
    "Comptable confirmé",
    "Commercial terrain",
    "Chef de chantier BTP",
    "Infirmier diplômé",
]


def make_raw_offers(n: int = 60) -> list[dict]:
    rng = random.Random(42)
    rows = []
    for i in range(n):
        title = TITLES[i % len(TITLES)]
        src = SOURCES[i % len(SOURCES)]
        city = CITIES[i % len(CITIES)]
        has_salary = i % 5 != 0
        rows.append({
            "job_id": f"{i:016x}",
            "scraped_at": BASE_TS.format(d=1 + i % 5, h=1 + i % 8),
            "scraper_version": "1.0",
            "country": "Côte d'Ivoire",
            "title": title if i % 7 else f"  {title}   (urgent) ",
            "company": None if i % 11 == 0 else f"Entreprise {i % 9}",
            "location": city,
            "description": (
                f"Nous recherchons un profil maitrisant python et sql pour {city}. "
                f"Salaire: {300 + (i % 5) * 50} 000 - {500 + (i % 5) * 50} 000 FCFA par mois."
                if has_salary
                else f"Poste de {title} a {city}. Maitrise de excel et communication."
            ),
            "requirements": "Experience requise: 3 ans minimum" if i % 3 else None,
            "salary": (
                {"amount": 400000 + (i % 5) * 50000, "currency": "FCFA",
                 "period": "month", "original_text": "400 000 FCFA/mois"}
                if i % 10 == 0 else None
            ),
            "contract_type": ["CDI", "CDD", None, "Stage"][i % 4],
            "experience_level": ["Débutant", "Intermédiaire", "Senior", None][i % 4],
            "industry": None,
            "skills": [["Python", "SQL"], ["Spark", "Kafka"], ["Excel"], []][i % 4],
            "source": src,
            "source_url": f"https://{src}.example/offre/{i}",
            "html_content": None,
        })
    # planted cross-source duplicate pair: same title/company/location,
    # different sources, one more complete than the other.
    for j, (src, desc) in enumerate([
        ("educarriere_ci", "Description complete avec python sql et salaire 450 000 FCFA par mois"),
        ("linkedin_ci", None),
    ]):
        rows.append({
            "job_id": f"dup{j:013x}",
            "scraped_at": "2024-03-02T05:00:00",
            "scraper_version": "1.0",
            "country": "Côte d'Ivoire",
            "title": "Ingénieur DevOps Cloud",
            "company": "TechCI",
            "location": "Abidjan",
            "description": desc,
            "requirements": None,
            "salary": None,
            "contract_type": "CDI" if j == 0 else None,
            "experience_level": "Senior",
            "industry": None,
            "skills": ["Docker", "Kubernetes"],
            "source": src,
            "source_url": f"https://{src}.example/offre/dup{j}",
            "html_content": None,
        })
    rng.shuffle(rows)
    return rows


BLOB_HTML = """<html><head><title>{title} - {company}</title></head>
<body>
<h1 class="job-title">{title}</h1>
<div class="company-name">{company}</div>
<span class="location">{city}</span>
<div class="job-description">Nous recherchons un {title} maitrisant python.</div>
<div class="requirements">3 ans d'experience</div>
<div class="salary">{salary}</div>
</body></html>"""

BLOB_HTML_FALLBACK = """<html><head><title>{title}</title></head>
<body><p>Offre d'emploi. Remuneration 350 000 FCFA par mois. Contrat CDI.</p></body></html>"""


def write_blobs(tmpdir: str, n: int = 10) -> str:
    """{job_id}.html files in the reference's blob format
    (base_scraper.py:310-343): json meta + blank line + html."""
    d = Path(tmpdir) / "blobs"
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        job_id = f"blob{i:012x}"
        meta = json.dumps({
            "job_id": job_id,
            "scraped_at": "2024-03-01T04:00:00",
            "source": SOURCES[i % len(SOURCES)],
            "size": 1234,
        })
        if i % 3 == 0:
            html = BLOB_HTML_FALLBACK.format(title=TITLES[i % len(TITLES)])
        else:
            html = BLOB_HTML.format(
                title=TITLES[i % len(TITLES)],
                company=f"Entreprise {i}",
                city=CITIES[i % len(CITIES)],
                salary=f"{300 + i * 10} 000 - {500 + i * 10} 000 FCFA par mois",
            )
        (d / f"{job_id}.html").write_text(meta + "\n\n" + html, encoding="utf-8")
    return str(d)


def make_cvs(n: int = 12) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append({
            "cv_id": f"cv{i:04d}",
            "annees_experience": i % 12,
            "niveau_etudes": "Master" if i % 2 else "Licence",
            "domaine_etudes": "Informatique",
            "localisation_souhaitee_id": f"LOC_{CITIES[i % len(CITIES)].upper().replace('-', '')[:10]}",
            "secteur_souhaite_id": "SECT_TIC",
            "salaire_souhaite": 300000.0 + (i % 6) * 50000,
            "type_contrat_souhaite": "CDI",
            "teletravail_souhaite": i % 2 == 0,
            "competences": [["python", "sql"], ["spark", "kafka"], ["excel"], ["docker", "kubernetes"]][i % 4],
            "certifications": [],
            "langues": [{"langue": "Français", "niveau": "C2"}],
            "source_site": "cvtheque",
            "url_cv": f"https://cv.example/{i}",
            "scraped_at": None,
            "disponibilite": "immediate",
            "statut": "actif",
        })
    return rows
