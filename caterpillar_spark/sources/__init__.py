from caterpillar_spark.sources.eml import parse_eml  # noqa: F401
from caterpillar_spark.sources.files import (  # noqa: F401
    read_csv_records,
    read_files,
    read_json_array,
    read_jsonl,
    slugify_expr,
    write_records,
)
from caterpillar_spark.sources.html import (  # noqa: F401
    html_dom_tree,
    html_table_records,
)
from caterpillar_spark.sources.http import (  # noqa: F401
    fetch_distributed,
    paginate,
)
from caterpillar_spark.sources.http_server import WebhookSpool  # noqa: F401
from caterpillar_spark.sources.param_store import (  # noqa: F401
    get_parameters,
    publish_parameters,
    put_parameters,
)
from caterpillar_spark.sources.poll import submit_and_poll  # noqa: F401
from caterpillar_spark.sources.sftp import (  # noqa: F401
    fetch_sftp,
    paramiko_transport,
    put_sftp,
)
from caterpillar_spark.sources.kafka import (  # noqa: F401
    parse_changelog_json,
    stream_kafka_changelog,
)
from caterpillar_spark.sources.queue import InMemoryQueue  # noqa: F401
from caterpillar_spark.sources.xlsx import read_excel  # noqa: F401
