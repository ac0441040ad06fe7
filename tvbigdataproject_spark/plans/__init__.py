from tvbigdataproject_spark.plans.pipelines import (  # noqa: F401
    TweetGraphPipeline,
)
