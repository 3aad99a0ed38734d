from .changelog import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    EVOLVED_COLUMN,
    generate_changelog_pandas,
    generate_changelog_spark,
    write_changelog,
)
from .oracle import replay_oracle  # noqa: F401
