"""Forem article fixture generator (FIXTURES.md §A): pretty-printed
JSON-array page files, the reference's own sink format
(fetch_articles.py:130, indent=2)."""

from __future__ import annotations

import json
from pathlib import Path


def make_article(i: int, published_at: str | None, **overrides) -> dict:
    art = {
        "id": i,
        "title": f"Article {i}",
        "description": f"Description of article {i}",
        "slug": f"article-{i}",
        "path": f"/user/article-{i}",
        "url": f"https://dev.example/user/article-{i}",
        "canonical_url": f"https://dev.example/user/article-{i}",
        "cover_image": None,
        "social_image": f"https://dev.example/social/{i}.png",
        "published_at": published_at,
        "created_at": published_at,
        "edited_at": None,
        "last_comment_at": published_at,
        "comments_count": i % 10,
        "positive_reactions_count": i % 50,
        "public_reactions_count": i % 50,
        "reading_time_minutes": 1 + i % 20,
        "tag_list": ["python", "spark"] if i % 2 == 0 else ["data"],
        "user": {
            "name": f"User {i % 7}",
            "username": f"user{i % 7}",
            "twitter_username": None,
            "github_username": f"gh{i % 7}",
            "user_id": 1000 + i % 7,
            "website_url": None,
            "profile_image": "https://dev.example/p.png",
            "profile_image_90": "https://dev.example/p90.png",
        },
        "organization": None
        if i % 3
        else {
            "name": "Org",
            "username": "org",
            "slug": "org",
            "profile_image": "https://dev.example/o.png",
            "profile_image_90": "https://dev.example/o90.png",
        },
        "flare_tag": None,
    }
    art.update(overrides)
    return art


def write_pages(
    fixture_dir: str | Path, pages: list[list[dict]], start_page: int = 1
) -> None:
    """One pretty-printed JSON-array file per page, like the reference."""
    d = Path(fixture_dir)
    d.mkdir(parents=True, exist_ok=True)
    for offset, articles in enumerate(pages):
        (d / f"page_{start_page + offset}.json").write_text(
            json.dumps(articles, indent=2)
        )


def ts(day: int, hour: int = 0, minute: int = 0) -> str:
    """ISO-8601 with trailing Z, like the dev.to API."""
    return f"2024-03-{day:02d}T{hour:02d}:{minute:02d}:00Z"
